package lagoonspark.media;

import org.apache.spark.sql.Row;
import org.apache.spark.sql.RowFactory;
import org.apache.spark.sql.api.java.UDF5;

/**
 * Native box-downsample UDF: (data binary, width int, height int,
 * channels int, factor int) -> struct(width int, height int, data
 * binary). Each output pixel is the integer box mean (sum / factor^2,
 * floor division) of a factor x factor input box; trailing rows/cols
 * that don't fill a whole box are truncated. The exact same rule as
 * the numpy tier in lagoon_spark/operators/multimodal.py
 * (resize_pixels), so the two tiers are byte-identical on ALL inputs,
 * not just lossless ones.
 */
public class ImageResize implements UDF5<byte[], Integer, Integer, Integer, Integer, Row> {
    @Override
    public Row call(byte[] data, Integer width, Integer height,
                    Integer channels, Integer factor) throws Exception {
        int w = width == null ? 0 : width;
        int h = height == null ? 0 : height;
        int c = channels == null ? 1 : channels;
        int f = factor == null ? 1 : factor;
        if (f < 1) {
            throw new IllegalArgumentException("factor must be >= 1");
        }
        if (c < 1) {
            throw new IllegalArgumentException("channels must be >= 1");
        }
        if (w < 0 || h < 0) {
            throw new IllegalArgumentException("width/height must be >= 0");
        }
        if (data == null || (long) w * h * c != data.length) {
            throw new IllegalArgumentException(
                "pixel buffer length != width*height*channels");
        }
        int ow = w / f;
        int oh = h / f;
        int div = f * f;
        byte[] out = new byte[ow * oh * c];
        int p = 0;
        for (int oy = 0; oy < oh; oy++) {
            for (int ox = 0; ox < ow; ox++) {
                for (int ch = 0; ch < c; ch++) {
                    int sum = 0;
                    int base = (oy * f * w + ox * f) * c + ch;
                    for (int fy = 0; fy < f; fy++) {
                        int rowOff = base + fy * w * c;
                        for (int fx = 0; fx < f; fx++) {
                            sum += data[rowOff + fx * c] & 0xFF;
                        }
                    }
                    out[p++] = (byte) (sum / div);
                }
            }
        }
        return RowFactory.create(ow, oh, out);
    }
}
