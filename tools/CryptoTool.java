// JCE cross-check harness for ocr_platform_spark.crypto: the JDK's own
// RC4 ("ARCFOUR") and AES/CBC implementations are the external ground
// truth the stdlib ciphers must match bit-exactly (tests/test_crypto.py).
//
// usage: java CryptoTool rc4        <keyhex> <datahex>
//        java CryptoTool aescbcenc  <keyhex> <ivhex> <datahex>   (NoPadding)
//        java CryptoTool aescbcdec  <keyhex> <ivhex> <datahex>   (NoPadding)
// prints the result as lowercase hex on stdout.

import javax.crypto.Cipher;
import javax.crypto.spec.IvParameterSpec;
import javax.crypto.spec.SecretKeySpec;

public final class CryptoTool {
    public static void main(String[] args) throws Exception {
        byte[] key = hex(args[1]);
        byte[] out;
        if (args[0].equals("rc4")) {
            Cipher c = Cipher.getInstance("ARCFOUR");
            c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "ARCFOUR"));
            out = c.doFinal(hex(args[2]));
        } else {
            int mode = args[0].equals("aescbcenc")
                    ? Cipher.ENCRYPT_MODE : Cipher.DECRYPT_MODE;
            Cipher c = Cipher.getInstance("AES/CBC/NoPadding");
            c.init(mode, new SecretKeySpec(key, "AES"),
                    new IvParameterSpec(hex(args[2])));
            out = c.doFinal(hex(args[3]));
        }
        StringBuilder sb = new StringBuilder();
        for (byte b : out) sb.append(String.format("%02x", b));
        System.out.println(sb);
    }

    static byte[] hex(String s) {
        byte[] v = new byte[s.length() / 2];
        for (int i = 0; i < v.length; i++)
            v[i] = (byte) Integer.parseInt(s.substring(2 * i, 2 * i + 2), 16);
        return v;
    }
}
