package graft.pipeline

/** Tail-N offset planning — the reference's core "query"
  * (kafka_client.py:144-156): per-partition seek targets for "the last
  * ~N messages, spread evenly across partitions".
  *
  * Pure driver-side arithmetic; the result feeds the Kafka batch
  * source's startingOffsets JSON, i.e. the limit is PUSHED DOWN to the
  * source — no scan-then-filter at any scale.
  */
object OffsetPlanner {

  /** target(p) = max(begin(p), end(p) - ceil(N / P)); returns targets
    * plus total available = Σ (end(p) - target(p)). Faithfully
    * per-partition (a skewed short partition yields fewer rows — NOT a
    * global top-N; SURVEY.md §7 hard-part 3).
    */
  def tailN(begin: Map[Int, Long], end: Map[Int, Long], n: Long): (Map[Int, Long], Long) = {
    require(begin.keySet == end.keySet, "partition sets must match")
    val parts = begin.keySet
    if (parts.isEmpty) return (Map.empty, 0L)
    val perPartition = ceilDiv(n, parts.size)
    val targets = parts.map { p =>
      p -> math.max(begin(p), end(p) - perPartition)
    }.toMap
    val available = targets.map { case (p, t) => end(p) - t }.sum
    (targets, available)
  }

  /** ceil(n / d) for non-negative n, positive d (kafka_client.py:146-147). */
  def ceilDiv(n: Long, d: Long): Long = (n + d - 1) / d

  /** Per-partition offsets JSON in the shape Spark's Kafka source takes
    * for startingOffsets/endingOffsets: {"topic":{"0":123,...}}.
    */
  def offsetsJson(topic: String, offsets: Map[Int, Long]): String = {
    val inner = offsets.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }.mkString(",")
    s"""{"${topic.replace("\"", "\\\"")}":{$inner}}"""
  }
}
