package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Engine extension point (SparkSessionExtensions): registers graft's
  * native SQL functions. Enable with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * — every graft entry point ([[graft.Graft.session]], Verify/Bench,
  * tests) does.
  *
  * Registered functions (each a codegen'd primitive loop, bit-identical
  * to the built-in shape it replaced — see the expression scaladocs):
  *  - `md5_prefix(str, digits)` → BIGINT ([[Md5Prefix]])
  *  - `vec_dot(a, b)` → DOUBLE ([[VecDot]])
  *  - `minhash_sig(hashes|shingles, k)` → ARRAY<BIGINT> ([[MinhashSig]])
  *  - `simhash32(hashes|shingles)` → BIGINT ([[Simhash32]])
  *  - `word_shingles(text, n)` → ARRAY<STRING> ([[WordShingles]])
  *  - `winnow_fps(text, k, w)` → ARRAY<BIGINT> ([[WinnowFps]])
  *  - `k_min(hash, k)` → ARRAY<BIGINT> aggregate ([[KMinHashes]])
  *  - `top_k_pairs(id, score, k)` → ARRAY<STRUCT<id,score>> aggregate
  *    ([[TopKPairs]])
  *  - `bloom_contains(value, bloom_b64)` → BOOLEAN ([[BloomContainsLong]])
  *  - `sorted_intersect_count(a, b)` → INT ([[SortedIntersectCount]])
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Extract a compile-time Int from a function argument. eval() on a
    * non-foldable (e.g. column) argument would throw an opaque error or
    * evaluate against a null row — demand foldability explicitly with a
    * readable failure instead. */
  private def intLit(fn: String, name: String)(e: Expression): Int = e match {
    case Literal(v: Int, _) => v
    case other =>
      require(other.foldable,
        s"$fn: $name must be a foldable integer literal, got ${other.sql}")
      val v = other.eval()
      // a foldable NULL would otherwise NPE at .toString — the exact
      // opaque-failure class this helper exists to prevent
      require(v != null, s"$fn: $name must not be NULL")
      v.toString.toInt
  }

  /** String twin of [[intLit]]: extract a compile-time String from a
    * foldable function argument. */
  private def strLit(fn: String, name: String)(e: Expression): String = {
    require(e.foldable, s"$fn: $name must be a foldable string literal, got ${e.sql}")
    val v = e.eval()
    require(v != null, s"$fn: $name must not be NULL")
    v.toString
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    def register(name: String, clazz: Class[_])(builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        new FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), builder))

    register("md5_prefix", classOf[Md5Prefix]) { children =>
      require(children.length == 2, "md5_prefix(str, digits)")
      Md5Prefix(children.head, intLit("md5_prefix", "digits")(children(1)))
    }
    register("vec_dot", classOf[VecDot]) { children =>
      require(children.length == 2, "vec_dot(a, b)")
      VecDot(children.head, children(1))
    }
    register("minhash_sig", classOf[MinhashSig]) { children =>
      require(children.length == 2, "minhash_sig(hashes, k)")
      MinhashSig(children.head, intLit("minhash_sig", "k")(children(1)))
    }
    register("simhash32", classOf[Simhash32]) { children =>
      require(children.length == 1, "simhash32(hashes)")
      Simhash32(children.head)
    }
    register("word_shingles", classOf[WordShingles]) { children =>
      require(children.length == 2, "word_shingles(text, n)")
      WordShingles(children.head, intLit("word_shingles", "n")(children(1)))
    }
    register("winnow_fps", classOf[WinnowFps]) { children =>
      require(children.length == 3, "winnow_fps(text, k, w)")
      WinnowFps(children.head,
        intLit("winnow_fps", "k")(children(1)),
        intLit("winnow_fps", "w")(children(2)))
    }
    // aggregate functions: the analyzer wraps the returned
    // AggregateFunction in an AggregateExpression at resolution
    register("k_min", classOf[KMinHashes]) { children =>
      require(children.length == 2, "k_min(hash, k)")
      KMinHashes(children.head, intLit("k_min", "k")(children(1)))
    }
    register("top_k_pairs", classOf[TopKPairs]) { children =>
      require(children.length == 3, "top_k_pairs(id, score, k)")
      TopKPairs(children.head, children(1), intLit("top_k_pairs", "k")(children(2)))
    }
    register("sorted_intersect_count", classOf[SortedIntersectCount]) { children =>
      require(children.length == 2, "sorted_intersect_count(a, b)")
      SortedIntersectCount(children.head, children(1))
    }
    register("bloom_contains", classOf[BloomContainsLong]) { children =>
      require(children.length == 2, "bloom_contains(value, bloom_b64)")
      BloomContainsLong(children.head,
        strLit("bloom_contains", "bloom_b64")(children(1)))
    }
  }
}
