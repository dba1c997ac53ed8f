package lagoonspark.media;

import java.nio.ByteBuffer;
import java.nio.ByteOrder;

import org.apache.spark.sql.Row;
import org.apache.spark.sql.RowFactory;
import org.apache.spark.sql.api.java.UDF1;

/**
 * Native WAV (RIFF/PCM) sample decode UDF: binary blob ->
 * struct(sample_rate int, samples array&lt;int&gt;).
 *
 * <p>Mirrors the pure-Python decoder pair in
 * lagoon_spark/operators/multimodal.py exactly: {@code _decode_wav}'s
 * RIFF chunk walk (word-aligned chunks, PCM format 1 only — anything
 * else throws, same loud refusal as the stdlib tier) followed by
 * {@code decode_audio_samples}' sample extraction, which reads the raw
 * PCM byte stream as consecutive little-endian int16 values. PCM is
 * lossless, so the two tiers are BIT-EXACT — the parity test asserts
 * list equality, not a tolerance.
 */
public class WavSamples implements UDF1<byte[], Row> {

    @Override
    public Row call(byte[] blob) throws Exception {
        if (blob == null || blob.length < 12) {
            throw new IllegalArgumentException("not a RIFF/WAVE container");
        }
        ByteBuffer buf = ByteBuffer.wrap(blob).order(ByteOrder.LITTLE_ENDIAN);
        if (buf.getInt(0) != 0x46464952 /* "RIFF" */
                || buf.getInt(8) != 0x45564157 /* "WAVE" */) {
            throw new IllegalArgumentException("not a RIFF/WAVE container");
        }
        // pos/next advance in 64-bit arithmetic: the chunk length is an
        // unsigned 32-bit field, and folding it through int (as the first
        // version did) let a malicious 0xFFFFFFF8 length wrap to -8 and
        // pin pos in place — an executor task spinning forever where the
        // stdlib tier exits the walk and raises. In long math next is
        // always > pos, so malformed lengths fall out of the loop and hit
        // the same "missing fmt/data" / "truncated" errors as Python.
        long pos = 12;
        int fmt = -1;
        int channels = 0;
        int rate = 0;
        int bits = 0;
        int pcmOff = -1;
        int pcmLen = 0;
        while (pos + 8 <= blob.length) {
            int ctype = buf.getInt((int) pos);
            long length = buf.getInt((int) pos + 4) & 0xFFFFFFFFL;
            int dataOff = (int) pos + 8;
            int avail = (int) Math.min(length, (long) blob.length - dataOff);
            if (ctype == 0x20746d66 /* "fmt " */ && avail >= 16) {
                fmt = buf.getShort(dataOff) & 0xFFFF;
                channels = buf.getShort(dataOff + 2) & 0xFFFF;
                rate = buf.getInt(dataOff + 4);
                bits = buf.getShort(dataOff + 14) & 0xFFFF;
            } else if (ctype == 0x61746164 /* "data" */) {
                pcmOff = dataOff;
                pcmLen = avail;
            }
            pos = (long) dataOff + length + (length & 1L);
        }
        if (fmt < 0 || pcmOff < 0) {
            throw new IllegalArgumentException("WAV missing fmt/data chunk");
        }
        if (fmt != 1) {
            throw new UnsupportedOperationException(
                "WAV format " + fmt + " (only PCM=1)");
        }
        int bytesPerFrame = channels * (bits / 8);
        if (bytesPerFrame == 0 || pcmLen % bytesPerFrame != 0) {
            throw new IllegalArgumentException("truncated WAV PCM data");
        }
        int n = pcmLen / 2; // raw stream as little-endian int16s
        int[] samples = new int[n];
        for (int i = 0; i < n; i++) {
            samples[i] = buf.getShort(pcmOff + 2 * i);
        }
        return RowFactory.create(rate, samples);
    }
}
