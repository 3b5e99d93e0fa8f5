package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** min(md5(x)) over a string array in one pass — the winnowing fingerprint
  * kernel. Equals `array_min(transform(arr, md5))` / SQL
  * `list_min([md5(x) for x in arr])` (hex order == unsigned digest order)
  * without allocating a hex string per element.
  */
case class MinMd5Hex(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "min_md5_hex"

  @transient private lazy val digests =
    ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val md = digests.get()
    var min: Array[Byte] = null
    var i = 0
    while (i < n) {
      md.reset()
      md.update(arr.getUTF8String(i).getBytes)
      val d = md.digest()
      if (min == null || unsignedLess(d, min)) min = d
      i += 1
    }
    val hex = "0123456789abcdef".getBytes
    val out = new Array[Byte](32)
    var j = 0
    while (j < 16) {
      out(2 * j) = hex((min(j) & 0xf0) >> 4)
      out(2 * j + 1) = hex(min(j) & 0x0f)
      j += 1
    }
    UTF8String.fromBytes(out)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var j = 0
    while (j < 16) {
      val x = a(j) & 0xff; val y = b(j) & 0xff
      if (x != y) return x < y
      j += 1
    }
    false
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinMd5Hex {
  def apply(arr: Column): Column =
    ColumnBridge.column(MinMd5Hex(ColumnBridge.expression(arr)))
}
