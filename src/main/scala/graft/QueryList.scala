package graft

/** Prints the registry's query names, one per line — consumed by
  * tools/scale_new_rows.py to find registry rows that SCALE.md's isolated
  * decade table has not measured yet. No SparkSession needed: the registry
  * map is closures + oracle SQL strings. */
object QueryList {
  def main(args: Array[String]): Unit =
    SparkEntry.queries.keys.foreach(n => println(s"QUERY $n"))
}
