package lagoonspark.media;

import org.apache.spark.sql.Row;
import org.apache.spark.sql.RowFactory;
import org.apache.spark.sql.api.java.UDF1;

/**
 * Native image decode UDF: binary blob -> struct(width int, height
 * int, channels int, data binary). Registered from Python via
 * spark.udf.registerJavaFunction (see
 * lagoon_spark/operators/native_media.py); pixel layout documented in
 * {@link Codec#decodeImage}.
 */
public class ImageDecode implements UDF1<byte[], Row> {
    @Override
    public Row call(byte[] blob) throws Exception {
        Codec.Decoded d = Codec.decodeImage(blob);
        return RowFactory.create(d.width, d.height, d.channels, d.data);
    }
}
