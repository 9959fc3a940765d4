package graft

import graft.examples.PretrainPipeline
import org.apache.spark.sql.functions._

/** Composition test: the full pretraining pipeline (clean → gate → lang →
  * exact dedup → near-dup dedup → decontaminate → cap → pack) runs as one
  * operator chain over the test corpus, filters only ever shrink the set,
  * and the stages that have exact ground truth agree with it.
  */
class PretrainPipelineSpec extends SparkSpec {

  test("pipeline stages compose; counts shrink monotonically; packing covers survivors") {
    val docs = Tables.load(spark, sfDir, "documents")
    val evalSet = docs.filter(col("doc_id") % 37 === 0)
      .select((col("doc_id") + 900000L).as("doc_id"), col("text"))
    val r = PretrainPipeline.run(docs, evalSet)
    val counts = r.stages.toMap
    val order = r.stages.map(_._1)
    assert(order == Seq("raw", "normalize", "c4_clean", "quality_gates", "lang_filter",
      "exact_dedup", "neardup_dedup", "decontaminate", "domain_cap", "packed"))
    // every filter stage is non-increasing
    r.stages.sliding(2).foreach { case Seq((a, ca), (b, cb)) =>
      assert(cb <= ca, s"$b ($cb) grew past $a ($ca)")
    }
    assert(counts("raw") == docs.count())
    assert(counts("packed") > 0)
    // the eval slice was built FROM train docs, so decontamination must
    // actually remove the surviving originals of those texts
    assert(counts("decontaminate") < counts("neardup_dedup"))
    // packed output: one row per surviving doc, every pack within budget
    assert(counts("packed") == counts("domain_cap"))
    val overBudget = r.packed.groupBy("pack_id")
      .agg(sum("n_tokens").as("tok"))
      // a pack may exceed budget only via a single doc longer than the
      // budget itself (packSequences splits greedily at doc granularity)
      .filter(col("tok") >= 2 * 512).count()
    assert(overBudget == 0, s"$overBudget packs at 2x budget")
  }
}
