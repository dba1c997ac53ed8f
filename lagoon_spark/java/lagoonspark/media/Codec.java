package lagoonspark.media;

import java.awt.image.BufferedImage;
import java.io.ByteArrayInputStream;
import java.nio.ByteBuffer;
import java.nio.ByteOrder;

import javax.imageio.ImageIO;

/**
 * Shared JVM-side media decode helpers for the lagoon_spark native
 * media tier (round-10 verdict task #1).
 *
 * <p>Decodes run entirely inside the executor JVM via javax.imageio --
 * no Python worker, no Arrow transfer, no per-row pickling. The pixel
 * layouts mirror the pure-Python fallback decoders in
 * lagoon_spark/operators/multimodal.py and operators/jpeg.py so the
 * two tiers are byte-comparable on lossless content:
 * grayscale images -> 1 byte/pixel raw band values, RGB -> 3 bytes
 * (R,G,B), images with alpha -> 4 bytes (R,G,B,A).
 */
final class Codec {

    private Codec() {}

    /** width, height, channels, tightly packed pixel bytes. */
    static final class Decoded {
        final int width;
        final int height;
        final int channels;
        final byte[] data;

        Decoded(int width, int height, int channels, byte[] data) {
            this.width = width;
            this.height = height;
            this.channels = channels;
            this.data = data;
        }
    }

    // Per-call ImageIO.read pays a provider-registry scan + reader
    // construction per image — the dominant cost for thumbnail-sized
    // inputs (a 16x16 JPEG decodes in microseconds; the lookup costs
    // more). Executor tasks are thread-pinned, so a ThreadLocal reader
    // per format amortizes that to zero; setInput(...) fully resets
    // reader state between calls.
    private static javax.imageio.ImageReader firstReader(String format) {
        java.util.Iterator<javax.imageio.ImageReader> it =
            ImageIO.getImageReadersByFormatName(format);
        if (!it.hasNext()) {
            throw new IllegalStateException(
                "no " + format + " ImageReader in this JVM");
        }
        return it.next();
    }

    private static final ThreadLocal<javax.imageio.ImageReader> JPEG_READER =
        ThreadLocal.withInitial(() -> firstReader("jpeg"));
    private static final ThreadLocal<javax.imageio.ImageReader> PNG_READER =
        ThreadLocal.withInitial(() -> firstReader("png"));
    private static final ThreadLocal<javax.imageio.ImageReader> GIF_READER =
        ThreadLocal.withInitial(() -> firstReader("gif"));

    private static BufferedImage readImage(byte[] blob) throws Exception {
        javax.imageio.ImageReader r = null;
        if (blob.length >= 3 && (blob[0] & 0xFF) == 0xFF
                && (blob[1] & 0xFF) == 0xD8 && (blob[2] & 0xFF) == 0xFF) {
            r = JPEG_READER.get();
        } else if (blob.length >= 4 && (blob[0] & 0xFF) == 0x89
                && blob[1] == 'P' && blob[2] == 'N' && blob[3] == 'G') {
            r = PNG_READER.get();
        }
        if (r == null) {
            return ImageIO.read(new ByteArrayInputStream(blob));
        }
        try (javax.imageio.stream.MemoryCacheImageInputStream iis =
                new javax.imageio.stream.MemoryCacheImageInputStream(
                    new ByteArrayInputStream(blob))) {
            r.setInput(iis, true, true);
            return r.read(0);
        } finally {
            r.setInput(null); // detach; the reader itself is reused
        }
    }

    static Decoded decodeImage(byte[] blob) throws Exception {
        BufferedImage img = readImage(blob);
        if (img == null) {
            throw new IllegalArgumentException(
                "ImageIO could not decode the supplied bytes");
        }
        int w = img.getWidth();
        int h = img.getHeight();
        java.awt.image.ColorModel cm = img.getColorModel();
        boolean grayCs = cm.getColorSpace().getType()
                == java.awt.color.ColorSpace.TYPE_GRAY;
        int nb = img.getRaster().getNumBands();
        if (cm instanceof java.awt.image.IndexColorModel) {
            // palette-indexed (PNG type 3): raw INDEX bytes, matching
            // the stdlib tier's payload (the palette is part of the
            // container, not the pixel stream)
            return new Decoded(w, h, 1, rasterBytes(img, w, h, 1));
        }
        if (grayCs && (nb == 1 || nb == 2)) {
            // grayscale / gray+alpha: raw band values, NOT getRGB
            // (which would run a gray->sRGB color-space conversion and
            // break parity with the raw-Y layout of the stdlib
            // JPEG/PNG decoders)
            return new Decoded(w, h, nb, rasterBytes(img, w, h, nb));
        }
        boolean alpha = cm.hasAlpha();
        int ch = alpha ? 4 : 3;
        int[] argb = img.getRGB(0, 0, w, h, null, 0, w);
        byte[] out = new byte[w * h * ch];
        int p = 0;
        for (int i = 0; i < argb.length; i++) {
            int v = argb[i];
            out[p++] = (byte) (v >>> 16); // R
            out[p++] = (byte) (v >>> 8);  // G
            out[p++] = (byte) v;          // B
            if (alpha) {
                out[p++] = (byte) (v >>> 24);
            }
        }
        return new Decoded(w, h, ch, out);
    }

    /** Interleaved raw raster bytes for the first {@code nb} bands. */
    private static byte[] rasterBytes(BufferedImage img, int w, int h, int nb) {
        byte[] out = new byte[w * h * nb];
        for (int b = 0; b < nb; b++) {
            int[] s = img.getRaster().getSamples(0, 0, w, h, b, (int[]) null);
            for (int i = 0; i < s.length; i++) {
                out[i * nb + b] = (byte) s[i];
            }
        }
        return out;
    }

    /** Result of a multi-frame GIF decode (palette indices per frame). */
    static final class GifDecoded {
        final int nFrames;
        final int width;  // logical screen, per the GIF header
        final int height;
        final byte[] data; // every frame's index bytes, concatenated

        GifDecoded(int nFrames, int width, int height, byte[] data) {
            this.nFrames = nFrames;
            this.width = width;
            this.height = height;
            this.data = data;
        }
    }

    /**
     * Decode every frame of an animated GIF to raw palette-index
     * bytes (frame-rect sized, no disposal composition) — the frame
     * semantics of the pure-Python {@code _decode_gif}: ImageIO's GIF
     * reader hands each frame back as its own TYPE_BYTE_INDEXED image,
     * whose raster IS the index stream. Width/height are the
     * logical-screen dims from the header, matching the Python tier.
     */
    static GifDecoded decodeGifFrames(byte[] blob) throws Exception {
        if (blob.length < 10 || blob[0] != 'G' || blob[1] != 'I' || blob[2] != 'F') {
            throw new IllegalArgumentException("not a GIF");
        }
        int w = (blob[6] & 0xFF) | ((blob[7] & 0xFF) << 8);
        int h = (blob[8] & 0xFF) | ((blob[9] & 0xFF) << 8);
        // same per-call registry-scan amortization as readImage
        javax.imageio.ImageReader reader = GIF_READER.get();
        try (javax.imageio.stream.MemoryCacheImageInputStream iis =
                new javax.imageio.stream.MemoryCacheImageInputStream(
                    new ByteArrayInputStream(blob))) {
            reader.setInput(iis, false);
            int n = reader.getNumImages(true);
            if (n < 1) {
                throw new IllegalArgumentException("GIF with no image data");
            }
            java.io.ByteArrayOutputStream out = new java.io.ByteArrayOutputStream();
            for (int i = 0; i < n; i++) {
                BufferedImage img = reader.read(i);
                if (!(img.getColorModel() instanceof java.awt.image.IndexColorModel)) {
                    // never expand to RGB: parity with the Python tier
                    // requires raw indices
                    throw new IllegalStateException(
                        "GIF frame decoded to a non-indexed image");
                }
                out.write(rasterBytes(img, img.getWidth(), img.getHeight(), 1));
            }
            return new GifDecoded(n, w, h, out.toByteArray());
        } finally {
            reader.setInput(null); // detach; the reader itself is reused
        }
    }

    /** Result of an AVI walk + frame-sampled decode. */
    static final class AviSampled {
        final int nFrames;
        final int nSampled;
        final int width;
        final int height;
        final byte[] data; // sampled frames' pixels, concatenated

        AviSampled(int nFrames, int nSampled, int width, int height, byte[] data) {
            this.nFrames = nFrames;
            this.nSampled = nSampled;
            this.width = width;
            this.height = height;
            this.data = data;
        }
    }

    /**
     * Walk a RIFF/AVI container, decode every MJPEG frame ('00dc' /
     * '00db' chunks) through ImageIO, keep every {@code every}-th
     * frame. Mirrors the chunk walk of the Python
     * {@code _decode_avi_mjpeg} (multimodal.py) so both tiers accept
     * the same containers and reject the same malformed ones.
     */
    static AviSampled decodeAviSample(byte[] blob, int every) throws Exception {
        if (every < 1) {
            throw new IllegalArgumentException("every must be >= 1");
        }
        if (blob.length < 12
                || blob[0] != 'R' || blob[1] != 'I' || blob[2] != 'F' || blob[3] != 'F'
                || blob[8] != 'A' || blob[9] != 'V' || blob[10] != 'I' || blob[11] != ' ') {
            throw new IllegalArgumentException("not a RIFF/AVI container");
        }
        ByteBuffer buf = ByteBuffer.wrap(blob).order(ByteOrder.LITTLE_ENDIAN);
        int[] dims = {-1, -1}; // from avih
        // MJPEG frames are independent: unsampled frames are COUNTED
        // (counts[0]) but never decoded — with every=30 (typical
        // keyframe sampling) that cuts decode cost ~30x, which is the
        // lever at video-corpus scale.
        int[] counts = {0}; // total video chunks seen
        java.util.ArrayList<byte[]> sampled = new java.util.ArrayList<>();
        walk(buf, 12, blob.length, dims, counts, every, sampled);
        if (dims[0] < 0) {
            throw new IllegalArgumentException("AVI missing avih header");
        }
        int total = 0;
        for (byte[] f : sampled) {
            total += f.length;
        }
        byte[] out = new byte[total];
        int p = 0;
        for (byte[] f : sampled) {
            System.arraycopy(f, 0, out, p, f.length);
            p += f.length;
        }
        return new AviSampled(counts[0], sampled.size(), dims[0], dims[1], out);
    }

    private static void walk(ByteBuffer buf, int pos, int end, int[] dims,
                             int[] counts, int every,
                             java.util.List<byte[]> sampled) throws Exception {
        while (pos + 8 <= end) {
            int c0 = buf.get(pos) & 0xFF, c1 = buf.get(pos + 1) & 0xFF,
                c2 = buf.get(pos + 2) & 0xFF, c3 = buf.get(pos + 3) & 0xFF;
            long lenU = buf.getInt(pos + 4) & 0xFFFFFFFFL;
            int payloadStart = pos + 8;
            int payloadEnd = (int) Math.min((long) payloadStart + lenU, end);
            if (c0 == 'L' && c1 == 'I' && c2 == 'S' && c3 == 'T') {
                walk(buf, payloadStart + 4, payloadEnd, dims, counts, every, sampled);
            } else if (c0 == 'a' && c1 == 'v' && c2 == 'i' && c3 == 'h') {
                dims[0] = buf.getInt(payloadStart + 32);
                dims[1] = buf.getInt(payloadStart + 36);
            } else if (c0 == '0' && c1 == '0' && (c2 == 'd')
                    && (c3 == 'c' || c3 == 'b') && payloadEnd > payloadStart) {
                int idx = counts[0]++;
                if (idx % every == 0) {
                    byte[] jpeg = new byte[payloadEnd - payloadStart];
                    ByteBuffer dup = buf.duplicate();
                    dup.position(payloadStart);
                    dup.get(jpeg);
                    sampled.add(decodeImage(jpeg).data);
                }
            }
            pos = payloadStart + (int) lenU + (int) (lenU & 1);
        }
    }
}
