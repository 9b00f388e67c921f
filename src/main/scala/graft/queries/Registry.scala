package graft.queries

import graft.QueryDef

/** Single registration point for every query module. SparkEntry derives the
  * driver-facing `queries` / `oracleSql` maps from this sequence.
  */
object Registry {
  def all: Seq[QueryDef] =
    Relational.all ++ Functions.all ++ TextPipeline.all ++ Similarity.all ++
      StacQueries.all ++ NetCdfQueries.all ++ MultimodalQueries.all ++
      EventOps.all ++ GroupingSets.all ++ TemporalJoins.all ++ Sketches.all ++
      WindowSetOps.all ++ TrainingPrep.all ++ Spatial.all ++ GraphRank.all
}
