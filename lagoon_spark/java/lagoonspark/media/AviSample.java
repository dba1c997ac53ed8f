package lagoonspark.media;

import org.apache.spark.sql.Row;
import org.apache.spark.sql.RowFactory;
import org.apache.spark.sql.api.java.UDF2;

/**
 * Native AVI/MJPEG frame-sampling UDF: (binary blob, every int) ->
 * struct(n_frames int, n_sampled int, width int, height int, data
 * binary) where data is the sampled frames' decoded pixels
 * concatenated -- the digest convention (md5 over upper-hex) is applied
 * JVM-side by the caller with built-in functions, keeping the whole
 * pipeline Python-free.
 */
public class AviSample implements UDF2<byte[], Integer, Row> {
    @Override
    public Row call(byte[] blob, Integer every) throws Exception {
        Codec.AviSampled s = Codec.decodeAviSample(blob, every == null ? 1 : every);
        return RowFactory.create(s.nFrames, s.nSampled, s.width, s.height, s.data);
    }
}
