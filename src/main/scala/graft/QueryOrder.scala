package graft

/** Prints the iteration order of SparkEntry.queries — the order the
  * bench loop actually runs (an immutable HashMap iterates in
  * hash-trie order, so ADDING one query can change which heavy query
  * precedes another; the m10 r8 drift investigation needed this order
  * without booting Spark). No SparkSession: the map holds unapplied
  * closures.
  */
object QueryOrder {
  def main(args: Array[String]): Unit =
    SparkEntry.queries.keys.foreach(println)
}
