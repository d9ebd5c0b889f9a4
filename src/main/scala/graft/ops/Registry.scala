package graft.ops

/** Single registry of every implemented query battery.
  *
  * `SparkEntry` derives its `queries` / `oracleSql` maps from here, so
  * each operator family lands in the driver's correctness + bench gates
  * by adding its `Q` to exactly one battery `all` list.
  */
object Registry {
  def all: Seq[Q] =
    AggBattery.all ++ JoinBattery.all ++ ScalarBattery.all ++
      WindowSetBattery.all ++ QuadBattery.all ++ TextBattery.all ++
      SimBattery.all ++ DocsBattery.all ++ MergeBattery.all ++
      TemporalBattery.all ++ GraphBattery.all ++ StreamBattery.all

  def byName: Map[String, Q] = {
    val qs = all
    require(qs.map(_.name).distinct.size == qs.size, {
      val dups = qs.groupBy(_.name).filter(_._2.size > 1).keys
      s"duplicate query names: ${dups.mkString(", ")}"
    })
    qs.map(q => q.name -> q).toMap
  }
}
