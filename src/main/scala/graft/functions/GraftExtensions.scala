package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Engine extension point (SparkSessionExtensions): registers graft's
  * native SQL functions. Enable with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * — every graft entry point (Verify/Bench/tests) does.
  *
  * Registered functions:
  *  - `md5_prefix(str, digits)` → BIGINT ([[Md5Prefix]]): portable
  *    md5-derived hash, callable inside lambda bodies of higher-order
  *    functions (where Column-level builders can't reach).
  *  - `vec_dot(a, b)` → DOUBLE ([[VecDot]]): codegen'd dense dot
  *    product, bit-identical to the sequential fold it replaces.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("md5_prefix"),
      new ExpressionInfo(classOf[Md5Prefix].getName, "md5_prefix"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "md5_prefix(str, digits)")
        val digits = children(1) match {
          case Literal(v: Int, _) => v
          case other =>
            // eval() on a non-foldable (e.g. column) argument would throw
            // an opaque error or evaluate against a null row — demand
            // foldability explicitly with a readable failure instead.
            require(other.foldable,
              s"md5_prefix: digits must be a foldable integer literal, got ${other.sql}")
            other.eval().toString.toInt
        }
        Md5Prefix(children.head, digits)
      }))
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vec_dot(a, b)")
        VecDot(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinhashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "minhash_sig(hashes, k)")
        val k = children(1) match {
          case Literal(v: Int, _) => v
          case other =>
            require(other.foldable,
              s"minhash_sig: k must be a foldable integer literal, got ${other.sql}")
            other.eval().toString.toInt
        }
        MinhashSig(children.head, k)
      }))
    ext.injectFunction((
      new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "word_shingles(text, n)")
        val n = children(1) match {
          case Literal(v: Int, _) => v
          case other =>
            require(other.foldable,
              s"word_shingles: n must be a foldable integer literal, got ${other.sql}")
            other.eval().toString.toInt
        }
        WordShingles(children.head, n)
      }))
    ext.injectFunction((
      new FunctionIdentifier("winnow_fps"),
      new ExpressionInfo(classOf[WinnowFps].getName, "winnow_fps"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "winnow_fps(text, k, w)")
        def lit(e: Expression, name: String): Int = e match {
          case Literal(v: Int, _) => v
          case other =>
            require(other.foldable,
              s"winnow_fps: $name must be a foldable integer literal, got ${other.sql}")
            other.eval().toString.toInt
        }
        WinnowFps(children.head, lit(children(1), "k"), lit(children(2), "w"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[Simhash32].getName, "simhash32"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "simhash32(hashes)")
        Simhash32(children.head)
      }))
  }
}
