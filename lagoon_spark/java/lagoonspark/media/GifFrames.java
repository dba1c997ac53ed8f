package lagoonspark.media;

import org.apache.spark.sql.Row;
import org.apache.spark.sql.RowFactory;
import org.apache.spark.sql.api.java.UDF1;

/**
 * Native animated-GIF decode UDF: binary blob -> struct(n_frames int,
 * width int, height int, data binary) where {@code data} is every
 * frame's palette-index bytes concatenated in order and width/height
 * are the logical-screen dims from the GIF header — the exact frame
 * semantics of the pure-Python {@code _decode_gif}
 * (lagoon_spark/operators/multimodal.py): frames are raw INDICES at
 * the frame rect, never palette-expanded pixels. Registered from
 * Python via spark.udf.registerJavaFunction (see
 * lagoon_spark/operators/native_media.py).
 */
public class GifFrames implements UDF1<byte[], Row> {
    @Override
    public Row call(byte[] blob) throws Exception {
        Codec.GifDecoded d = Codec.decodeGifFrames(blob);
        return RowFactory.create(d.nFrames, d.width, d.height, d.data);
    }
}
