package graft.features

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.sql.DataFrame

/** NVTabular-Workflow-shaped assembly (reference: workflow_builder.py:13-77
  * fit at my_merlin_flow.py:233-241): a spark.ml Pipeline of the feature
  * stages, fitted ON THE UNION of train/valid/test and then applied per
  * split — the reference deliberately fits statistics on all splits
  * (documented leakage, reproduced as-is; see SURVEY §7 known-hard #7).
  */
object FeaturePipeline {

  /** Fit on the union, transform each split (U1 + A4/A5 semantics). */
  def fitOnUnion(pipeline: Pipeline, splits: Seq[DataFrame]): (PipelineModel, Seq[DataFrame]) = {
    require(splits.nonEmpty, "no splits")
    val union = splits.reduce(_ unionByName _)
    val model = pipeline.fit(union)
    (model, splits.map(model.transform))
  }
}
