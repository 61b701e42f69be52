package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC-4648 Base32 codec expressions (ref: SqlLibraryOperators.java:1944
  * FROM_BASE32 / :1950 TO_BASE32 — BigQuery dialect; Spark has base64
  * builtins but no base32). Pure per-row transforms: no state, no
  * shuffle, safe at any scale. */
object Base32 {
  private val alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
  private val rev: Array[Int] = {
    val a = Array.fill(128)(-1)
    alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  def encode(bytes: Array[Byte]): String = {
    val sb = new StringBuilder
    var buffer = 0L
    var bits = 0
    bytes.foreach { b =>
      buffer = (buffer << 8) | (b & 0xffL)
      bits += 8
      while (bits >= 5) {
        sb.append(alphabet.charAt(((buffer >> (bits - 5)) & 0x1f).toInt))
        bits -= 5
      }
    }
    if (bits > 0) sb.append(alphabet.charAt(((buffer << (5 - bits)) & 0x1f).toInt))
    while (sb.length % 8 != 0) sb.append('=')
    sb.toString
  }

  def decode(s: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    var buffer = 0L
    var bits = 0
    s.foreach { c =>
      if (c != '=') {
        val v = if (c < 128) rev(c.toUpper.toInt) else -1
        if (v < 0) throw new IllegalArgumentException(s"invalid base32 char '$c'")
        buffer = (buffer << 5) | v
        bits += 5
        if (bits >= 8) {
          out.write(((buffer >> (bits - 8)) & 0xff).toInt)
          bits -= 8
        }
      }
    }
    out.toByteArray
  }
}

/** to_base32(binary) → string. */
case class ToBase32(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(Base32.encode(v.asInstanceOf[Array[Byte]]))
  override protected def withNewChildInternal(c: Expression) = copy(c)
  override def prettyName: String = "to_base32"
}

/** from_base32(string) → binary. */
case class FromBase32(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any =
    Base32.decode(v.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(c: Expression) = copy(c)
  override def prettyName: String = "from_base32"
}
