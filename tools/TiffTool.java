// External ground-truth harness for the stdlib TIFF/LZW/PackBits/CCITT
// codecs: Java ImageIO (JDK 9+ ships the TIFF plugin) encodes and decodes
// TIFFs independently of this repo's Python implementation, so tests can
// pin bit-exact parity against a foreign codec without PIL/libtiff.
//
//   java TiffTool encode <in.pnm> <out.tiff> <compression>
//       compression: None | LZW | PackBits | Deflate | ZLib |
//                    "CCITT RLE" | "CCITT T.4" | "CCITT T.6"
//       (CCITT requires a bilevel PGM: maxval 255, pixels 0 or 255)
//   java TiffTool decode <in.tiff> <out.pnm> [pageIndex]
//
// PNM here is binary P5 (gray) / P6 (RGB), maxval 255 -- trivial to read
// and write from Python with no third-party libs.

import java.awt.image.BufferedImage;
import java.awt.image.Raster;
import java.io.*;
import java.util.Iterator;
import javax.imageio.*;
import javax.imageio.stream.*;

public final class TiffTool {
    public static void main(String[] args) throws Exception {
        if (args[0].equals("encode")) {
            encode(args[1], args[2], args[3],
                   args.length > 5 ? Integer.parseInt(args[4]) : 0,
                   args.length > 5 ? Integer.parseInt(args[5]) : 0);
        } else if (args[0].equals("decode")) {
            decode(args[1], args[2], args.length > 3 ? Integer.parseInt(args[3]) : 0);
        } else if (args[0].equals("encodejpeg")) {
            encodeJpeg(args[1], args[2], args[3].equals("progressive"),
                       args.length > 4 ? Float.parseFloat(args[4]) : 0.9f);
        } else if (args[0].equals("decodejpeg")) {
            decodeJpeg(args[1], args[2]);
        } else if (args[0].equals("decodejpegraster")) {
            decodeJpegRaster(args[1], args[2]);
        } else if (args[0].equals("encodegif")) {
            encodeGif(args[1], args[2]);
        } else if (args[0].equals("decodegif")) {
            decodeGif(args[1], args[2], args.length > 3 ? Integer.parseInt(args[3]) : 0);
        } else if (args[0].equals("encodepng")) {
            encodePng(args[1], args[2], args[3]);
        } else if (args[0].equals("decodepng")) {
            decodeRgb("png", args[1], args[2], 0);
        } else if (args[0].equals("encodebmp")) {
            encodeBmp(args[1], args[2], args[3]);
        } else if (args[0].equals("decodebmp")) {
            decodeBmp(args[1], args[2]);
        } else {
            throw new IllegalArgumentException("encode|decode|encode/decodejpeg|encode/decodegif|encode/decodepng");
        }
    }

    static int readToken(DataInputStream in) throws IOException {
        int c;
        do { c = in.read(); } while (c == ' ' || c == '\n' || c == '\r' || c == '\t');
        if (c == '#') { while (in.read() != '\n') {} return readToken(in); }
        int v = 0;
        while (c >= '0' && c <= '9') { v = v * 10 + (c - '0'); c = in.read(); }
        return v;
    }

    static void encode(String pnmPath, String tiffPath, String compression,
                       int tileW, int tileH) throws Exception {
        DataInputStream in = new DataInputStream(new BufferedInputStream(new FileInputStream(pnmPath)));
        int magic0 = in.read(), magic1 = in.read();
        boolean rgb = magic1 == '6';
        int w = readToken(in), h = readToken(in), maxv = readToken(in);
        if (magic0 != 'P' || maxv != 255) throw new IOException("need binary P5/P6 maxval 255");
        byte[] px = new byte[w * h * (rgb ? 3 : 1)];
        in.readFully(px);
        in.close();

        boolean ccitt = compression.startsWith("CCITT");
        BufferedImage img = new BufferedImage(w, h,
            rgb ? BufferedImage.TYPE_3BYTE_BGR
                : (ccitt ? BufferedImage.TYPE_BYTE_BINARY : BufferedImage.TYPE_BYTE_GRAY));
        // raw raster samples, NOT setRGB: setRGB round-trips through the
        // sRGB color model and gamma-warps TYPE_BYTE_GRAY pixels
        java.awt.image.WritableRaster wr = img.getRaster();
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                if (rgb) {
                    int i = (y * w + x) * 3;
                    wr.setPixel(x, y, new int[]{px[i] & 255, px[i + 1] & 255, px[i + 2] & 255});
                } else {
                    int g = px[y * w + x] & 255;
                    wr.setSample(x, y, 0, ccitt ? (g >= 128 ? 1 : 0) : g);
                }
            }

        Iterator<ImageWriter> it = ImageIO.getImageWritersByFormatName("tiff");
        ImageWriter writer = it.next();
        ImageWriteParam p = writer.getDefaultWriteParam();
        if (!compression.equals("None")) {
            p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
            p.setCompressionType(compression);
        }
        if (tileW > 0) {  // tiled layout (tile dims must be multiples of 16)
            p.setTilingMode(ImageWriteParam.MODE_EXPLICIT);
            p.setTiling(tileW, tileH, 0, 0);
        }
        ImageOutputStream ios = ImageIO.createImageOutputStream(new File(tiffPath));
        writer.setOutput(ios);
        writer.write(null, new IIOImage(img, null, null), p);
        ios.close();
        writer.dispose();
    }

    static BufferedImage readPnm(String pnmPath) throws IOException {
        DataInputStream in = new DataInputStream(new BufferedInputStream(new FileInputStream(pnmPath)));
        int magic0 = in.read(), magic1 = in.read();
        boolean rgb = magic1 == '6';
        int w = readToken(in), h = readToken(in), maxv = readToken(in);
        if (magic0 != 'P' || maxv != 255) throw new IOException("need binary P5/P6 maxval 255");
        byte[] px = new byte[w * h * (rgb ? 3 : 1)];
        in.readFully(px);
        in.close();
        BufferedImage img = new BufferedImage(w, h,
            rgb ? BufferedImage.TYPE_3BYTE_BGR : BufferedImage.TYPE_BYTE_GRAY);
        java.awt.image.WritableRaster wr = img.getRaster();
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                if (rgb) {
                    int i = (y * w + x) * 3;
                    wr.setPixel(x, y, new int[]{px[i] & 255, px[i + 1] & 255, px[i + 2] & 255});
                } else {
                    wr.setSample(x, y, 0, px[y * w + x] & 255);
                }
            }
        return img;
    }

    static void encodeJpeg(String pnmPath, String jpegPath, boolean progressive, float quality) throws Exception {
        BufferedImage img = readPnm(pnmPath);
        Iterator<ImageWriter> it = ImageIO.getImageWritersByFormatName("jpeg");
        ImageWriter writer = it.next();
        ImageWriteParam p = writer.getDefaultWriteParam();
        p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
        p.setCompressionQuality(quality);
        p.setProgressiveMode(progressive ? ImageWriteParam.MODE_DEFAULT
                                         : ImageWriteParam.MODE_DISABLED);
        ImageOutputStream ios = ImageIO.createImageOutputStream(new File(jpegPath));
        writer.setOutput(ios);
        writer.write(null, new IIOImage(img, null, null), p);
        ios.close();
        writer.dispose();
    }

    // GIF ground truth: ImageIO's GIF plugin is LZW-lossless over an
    // explicit palette, so both directions pin bit-exactly. P5 input
    // encodes through a 256-gray IndexColorModel via raster.setSample
    // (setRGB gamma-warps indexed/gray rasters); decode normalizes the
    // palettized raster through getRGB and emits P6.
    static void encodeGif(String pnmPath, String gifPath) throws Exception {
        BufferedImage src = readPnm(pnmPath);
        int w = src.getWidth(), h = src.getHeight();
        byte[] ramp = new byte[256];
        for (int i = 0; i < 256; i++) ramp[i] = (byte) i;
        java.awt.image.IndexColorModel icm =
            new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp);
        BufferedImage img = new BufferedImage(w, h,
            BufferedImage.TYPE_BYTE_INDEXED, icm);
        int[] smp = new int[src.getRaster().getNumBands()];
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                src.getRaster().getPixel(x, y, smp);
                img.getRaster().setSample(x, y, 0, smp[0]);
            }
        if (!ImageIO.write(img, "gif", new File(gifPath)))
            throw new IOException("no GIF writer available");
    }

    // PNG ground truth for the stdlib decoder: lossless in every mode,
    // so parity pins are bit-exact. mode: plain | progressive (Adam7) |
    // gray1[progressive] (1-bit bilevel) | pal4[progressive] (4-bit
    // 16-gray palette).
    static void encodePng(String pnmPath, String pngPath, String mode) throws Exception {
        BufferedImage src = readPnm(pnmPath);
        int w = src.getWidth(), h = src.getHeight();
        BufferedImage img = src;
        if (mode.startsWith("gray1")) {
            img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_BINARY);
            for (int y = 0; y < h; y++)
                for (int x = 0; x < w; x++)
                    img.getRaster().setSample(x, y, 0,
                        src.getRaster().getSample(x, y, 0) >= 128 ? 1 : 0);
        } else if (mode.startsWith("pal4")) {
            byte[] ramp = new byte[16];
            for (int i = 0; i < 16; i++) ramp[i] = (byte) (i * 17);
            java.awt.image.IndexColorModel icm =
                new java.awt.image.IndexColorModel(4, 16, ramp, ramp, ramp);
            img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_BINARY, icm);
            for (int y = 0; y < h; y++)
                for (int x = 0; x < w; x++)
                    img.getRaster().setSample(x, y, 0,
                        src.getRaster().getSample(x, y, 0) >> 4);
        }
        Iterator<ImageWriter> it = ImageIO.getImageWritersByFormatName("png");
        ImageWriter writer = it.next();
        ImageWriteParam p = writer.getDefaultWriteParam();
        p.setProgressiveMode(mode.contains("progressive")
            ? ImageWriteParam.MODE_DEFAULT : ImageWriteParam.MODE_DISABLED);
        ImageOutputStream ios = ImageIO.createImageOutputStream(new File(pngPath));
        writer.setOutput(ios);
        writer.write(null, new IIOImage(img, null, null), p);
        ios.close();
        writer.dispose();
    }

    // BMP ground truth: lossless in every mode, so parity pins are
    // bit-exact. compression: BI_RGB (24-bit from P6, 8-bit gray
    // palette from P5) | BI_RLE8 (P5 through a 256-gray palette).
    static void encodeBmp(String pnmPath, String bmpPath, String compression) throws Exception {
        BufferedImage src = readPnm(pnmPath);
        BufferedImage img = src;
        if (src.getRaster().getNumBands() == 1) {
            int w = src.getWidth(), h = src.getHeight();
            byte[] ramp = new byte[256];
            for (int i = 0; i < 256; i++) ramp[i] = (byte) i;
            java.awt.image.IndexColorModel icm =
                new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp);
            img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, icm);
            for (int y = 0; y < h; y++)
                for (int x = 0; x < w; x++)
                    img.getRaster().setSample(x, y, 0,
                        src.getRaster().getSample(x, y, 0));
        }
        Iterator<ImageWriter> it = ImageIO.getImageWritersByFormatName("bmp");
        ImageWriter writer = it.next();
        ImageWriteParam p = writer.getDefaultWriteParam();
        p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
        p.setCompressionType(compression);
        ImageOutputStream ios = ImageIO.createImageOutputStream(new File(bmpPath));
        writer.setOutput(ios);
        writer.write(null, new IIOImage(img, null, null), p);
        ios.close();
        writer.dispose();
    }

    static void decodeGif(String gifPath, String pnmPath, int page) throws Exception {
        decodeRgb("gif", gifPath, pnmPath, page);
    }

    // BMP decode via RAW raster samples: the BMP reader models a gray-ramp
    // palette as TYPE_BYTE_GRAY in a LINEAR gray ColorSpace, so getRGB
    // gamma-warps (128 -> 188) even though the decoded samples are exact.
    // Indexed images (non-gray palettes) still normalize through the
    // IndexColorModel, which maps palette colors without a gamma step.
    static void decodeBmp(String bmpPath, String pnmPath) throws Exception {
        BufferedImage img = ImageIO.read(new File(bmpPath));
        if (img == null) throw new IOException("ImageIO could not decode " + bmpPath);
        int w = img.getWidth(), h = img.getHeight();
        Raster r = img.getRaster();
        boolean indexed = img.getColorModel() instanceof java.awt.image.IndexColorModel;
        boolean rgb = indexed || r.getNumBands() >= 3;
        OutputStream out = new BufferedOutputStream(new FileOutputStream(pnmPath));
        out.write((rgb ? "P6\n" : "P5\n").getBytes());
        out.write((w + " " + h + "\n255\n").getBytes());
        int[] smp = new int[r.getNumBands()];
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                if (indexed) {
                    int v = img.getRGB(x, y);
                    out.write((v >> 16) & 255);
                    out.write((v >> 8) & 255);
                    out.write(v & 255);
                } else {
                    r.getPixel(x, y, smp);
                    if (rgb) { out.write(smp[0]); out.write(smp[1]); out.write(smp[2]); }
                    else out.write(smp[0]);
                }
            }
        out.close();
    }

    // color-model-aware decode (getRGB, not raw Raster samples): indexed
    // and bilevel images dump COLOR values, not palette indices/bits
    static void decodeRgb(String fmt, String inPath, String pnmPath, int page) throws Exception {
        Iterator<ImageReader> it = ImageIO.getImageReadersByFormatName(fmt);
        ImageReader reader = it.next();
        ImageInputStream iis = ImageIO.createImageInputStream(new File(inPath));
        reader.setInput(iis);
        BufferedImage img = reader.read(page);
        int w = img.getWidth(), h = img.getHeight();
        OutputStream out = new BufferedOutputStream(new FileOutputStream(pnmPath));
        out.write("P6\n".getBytes());
        out.write((w + " " + h + "\n255\n").getBytes());
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                int rgb = img.getRGB(x, y);
                out.write((rgb >> 16) & 255);
                out.write((rgb >> 8) & 255);
                out.write(rgb & 255);
            }
        out.close();
        reader.dispose();
        iis.close();
    }

    static void decodeJpeg(String jpegPath, String pnmPath) throws Exception {
        BufferedImage img = ImageIO.read(new File(jpegPath));
        if (img == null) throw new IOException("ImageIO could not decode " + jpegPath);
        int w = img.getWidth(), h = img.getHeight();
        Raster r = img.getRaster();
        int bands = r.getNumBands();
        boolean rgb = bands >= 3;
        OutputStream out = new BufferedOutputStream(new FileOutputStream(pnmPath));
        out.write((rgb ? "P6\n" : "P5\n").getBytes());
        out.write((w + " " + h + "\n255\n").getBytes());
        int[] smp = new int[bands];
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                r.getPixel(x, y, smp);
                if (rgb) { out.write(smp[0]); out.write(smp[1]); out.write(smp[2]); }
                else out.write(smp[0]);
            }
        out.close();
    }

    // raw entropy-decoded samples WITHOUT color conversion (readRaster):
    // the ground truth for CMYK/YCCK JPEGs, which ImageIO.read refuses.
    // Output: "PR\n<w> <h> <bands>\n255\n" + pixel-interleaved bytes.
    static void decodeJpegRaster(String jpegPath, String rawPath) throws Exception {
        Iterator<ImageReader> it = ImageIO.getImageReadersByFormatName("jpeg");
        ImageReader reader = it.next();
        ImageInputStream iis = ImageIO.createImageInputStream(new File(jpegPath));
        reader.setInput(iis);
        Raster r = reader.readRaster(0, null);
        int w = r.getWidth(), h = r.getHeight(), bands = r.getNumBands();
        OutputStream out = new BufferedOutputStream(new FileOutputStream(rawPath));
        out.write(("PR\n" + w + " " + h + " " + bands + "\n255\n").getBytes());
        int[] smp = new int[bands];
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                r.getPixel(x, y, smp);
                for (int b = 0; b < bands; b++) out.write(smp[b]);
            }
        out.close();
        reader.dispose();
        iis.close();
    }

    static void decode(String tiffPath, String pnmPath, int page) throws Exception {
        Iterator<ImageReader> it = ImageIO.getImageReadersByFormatName("tiff");
        ImageReader reader = it.next();
        ImageInputStream iis = ImageIO.createImageInputStream(new File(tiffPath));
        reader.setInput(iis);
        BufferedImage img = reader.read(page);
        int w = img.getWidth(), h = img.getHeight();
        Raster r = img.getRaster();
        int bands = r.getNumBands();
        boolean rgb = bands >= 3;
        OutputStream out = new BufferedOutputStream(new FileOutputStream(pnmPath));
        out.write((rgb ? "P6\n" : "P5\n").getBytes());
        out.write((w + " " + h + "\n255\n").getBytes());
        int[] smp = new int[bands];
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                r.getPixel(x, y, smp);
                if (rgb) { out.write(smp[0]); out.write(smp[1]); out.write(smp[2]); }
                else if (img.getColorModel().getPixelSize() == 1) {
                    // bilevel: sample 1 = white for WhiteIsZero handled by
                    // the color model; normalize through getRGB
                    out.write(img.getRGB(x, y) & 255);
                } else out.write(smp[0]);
            }
        out.close();
        reader.dispose();
        iis.close();
    }
}
