package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All MinHash signature values in ONE pass over a document's shingles.
  *
  * Value i is min over shingles of the (i%4)-th 8-hex-char chunk of
  * md5(shingle || ":" || i/4) — exactly the composable
  * `array_min(transform(shingles, s -> substr(md5(s || ':d'), 1+8c, 8)))`,
  * and therefore reproducible in an ANSI-SQL oracle. The composable form
  * re-runs md5 for every chunk and allocates a string per (shingle, hash);
  * this expression hashes each shingle once per seed and keeps the running
  * minima as raw 4-byte compares (hex order == unsigned byte order),
  * formatting to hex only once at the end.
  *
  * CodegenFallback: the md5 call dominates per-row cost; codegen would only
  * inline the loop shell.
  */
case class MinhashChunks(child: Expression, numSeeds: Int)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_chunks"

  @transient private lazy val digests =
    ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))
  @transient private lazy val seedSuffixes: Array[Array[Byte]] =
    Array.tabulate(numSeeds)(d => s":$d".getBytes("UTF-8"))

  override def nullSafeEval(input: Any): Any = {
    val shingles = input.asInstanceOf[ArrayData]
    val n = shingles.numElements()
    val md = digests.get()
    val mins = new Array[Array[Byte]](numSeeds * 4)
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i).getBytes
      var d = 0
      while (d < numSeeds) {
        md.reset()
        md.update(s)
        md.update(seedSuffixes(d))
        val digest = md.digest() // 16 bytes = 4 chunks of 4
        var c = 0
        while (c < 4) {
          val idx = d * 4 + c
          if (mins(idx) == null || unsignedLess(digest, c * 4, mins(idx))) {
            val chunk = new Array[Byte](4)
            System.arraycopy(digest, c * 4, chunk, 0, 4)
            mins(idx) = chunk
          }
          c += 1
        }
        d += 1
      }
      i += 1
    }
    val hex = "0123456789abcdef".getBytes
    new GenericArrayData(mins.map { m =>
      val out = new Array[Byte](8)
      var j = 0
      while (j < 4) {
        out(2 * j) = hex((m(j) & 0xf0) >> 4)
        out(2 * j + 1) = hex(m(j) & 0x0f)
        j += 1
      }
      UTF8String.fromBytes(out)
    }.asInstanceOf[Array[Any]])
  }

  private def unsignedLess(a: Array[Byte], aOff: Int, b: Array[Byte]): Boolean = {
    var j = 0
    while (j < 4) {
      val x = a(aOff + j) & 0xff
      val y = b(j) & 0xff
      if (x != y) return x < y
      j += 1
    }
    false
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashChunks {
  def apply(shingles: Column, numSeeds: Int): Column =
    ColumnBridge.column(MinhashChunks(ColumnBridge.expression(shingles), numSeeds))
}
