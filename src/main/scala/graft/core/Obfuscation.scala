package graft.core

/**
 * Credential obfuscation helpers — Base64 round-trip matching the
 * reference's connector-credential handling
 * (ref: operations/obfuscation_operations.py:12-39). Driver-side only;
 * obfuscation is encoding, not encryption — same caveat as the reference.
 */
object Obfuscation {
  private val utf8 = java.nio.charset.StandardCharsets.UTF_8

  def encode(value: String): String =
    java.util.Base64.getEncoder.encodeToString(value.getBytes(utf8))

  def decode(encoded: String): String =
    new String(java.util.Base64.getDecoder.decode(encoded), utf8)

  /** Encode every value of a credential map (ref: :26-32). */
  def encodeMap(creds: Map[String, String]): Map[String, String] =
    creds.map { case (k, v) => k -> encode(v) }

  def decodeMap(creds: Map[String, String]): Map[String, String] =
    creds.map { case (k, v) => k -> decode(v) }
}
