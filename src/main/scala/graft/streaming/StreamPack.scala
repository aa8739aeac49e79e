package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sequence packing — the EXACT greedy first-fit-contiguous
  * packer that the batch operator ([[graft.operators.PrefixSum
  * .packByBudget]]) deliberately approximates: a stream is already a
  * sequence, so the sequential semantics batch cannot scale to come for
  * free here. Docs are packed per `source` in arrival order (doc_id
  * order within each micro-batch, which makes replays deterministic);
  * a doc that would overflow the running pack closes it and opens the
  * next; a doc larger than the budget gets a pack of its own.
  *
  * State per source is two longs (open pack id, tokens in it) —
  * bounded, keyed by source, so state scales with the number of
  * sources, never the corpus. Production would add an idle timeout to
  * retire dead sources; the test corpus is finite.
  */
object StreamPack {

  case class DocTokens(source: String, doc_id: Long, n_tokens: Long)
  case class PackedDoc(source: String, doc_id: Long, n_tokens: Long, pack_id: Long)
  case class PackState(openPack: Long, tokensInPack: Long)

  /** Assign pack ids per source under `budget` tokens per pack. */
  def packByBudget(spark: SparkSession, docs: Dataset[DocTokens],
                   budget: Long): Dataset[PackedDoc] = {
    require(budget > 0, "budget must be positive")
    import spark.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState[PackState, PackedDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (source, batch, state: GroupState[PackState]) =>
          var st = state.getOption.getOrElse(PackState(0L, 0L))
          val out = batch.toSeq.sortBy(_.doc_id).map { d =>
            st =
              if (st.tokensInPack > 0 && st.tokensInPack + d.n_tokens > budget)
                PackState(st.openPack + 1, d.n_tokens)
              else
                PackState(st.openPack, st.tokensInPack + d.n_tokens)
            PackedDoc(source, d.doc_id, d.n_tokens, st.openPack)
          }
          state.update(st)
          out.iterator
      }
  }
}
