package graft.sql

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** SortedInterCountF ≡ size(array_intersect) under the sorted-distinct
  * precondition — the exactness gate for q175's verification rewrite
  * (round 16). Both operands go through array_sort(array_distinct(...)),
  * exactly what SetSimJoin.prepared produces. */
class SortedInterCountFSpec extends SparkSpecBase {
  import spark.implicits._

  private def prep(c: org.apache.spark.sql.Column) =
    array_sort(array_distinct(c))

  test("equals size(array_intersect) on real corpus shingles") {
    GraftFunctions.register(spark)
    val docs = tbl("documents").select($"doc_id", $"text").limit(60)
      .select($"doc_id",
        prep(GraftFunctions.charNgrams(lower($"text"), 5)).as("__s"))
    val pairs = docs.as("a").crossJoin(docs.as("b"))
      .filter($"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id", $"b.doc_id",
        GraftFunctions.sortedInterCount($"a.__s", $"b.__s").as("merge"),
        size(array_intersect($"a.__s", $"b.__s")).as("ref"))
    assert(pairs.filter($"merge" =!= $"ref").isEmpty,
      "merge count must equal array_intersect on every pair")
    assert(pairs.count() === 60L * 59 / 2)
  }

  test("randomized token sets, incl. duplicates collapsed upstream") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "bb", "ccc", "é", "你好", "😀", "z1", "k2", "m3", "", " ")
    val rows = (1 to 200).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))))
    }
    val df = rows.toDF("id", "toks").select($"id", prep($"toks").as("__s"))
    val pairs = df.as("a").crossJoin(df.as("b"))
      .select(
        GraftFunctions.sortedInterCount($"a.__s", $"b.__s").as("merge"),
        size(array_intersect($"a.__s", $"b.__s")).as("ref"))
    assert(pairs.filter($"merge" =!= $"ref").isEmpty)
  }

  test("null element, empty array, and null array edges") {
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, Seq[String]("a", null, "b")),
      (2L, Seq[String](null)),
      (3L, Seq.empty[String]),
      (4L, null.asInstanceOf[Seq[String]]),
      (5L, Seq[String]("a", "b", "c"))
    ).toDF("id", "toks").select($"id", prep($"toks").as("__s"))
    val pairs = df.as("a").crossJoin(df.as("b"))
      .select($"a.id".as("ia"), $"b.id".as("ib"),
        GraftFunctions.sortedInterCount($"a.__s", $"b.__s").as("merge"),
        size(array_intersect($"a.__s", $"b.__s")).as("ref"))
    // null-safe equality: a null array on either side must give null on
    // BOTH columns; non-null pairs must count identically (incl. the
    // null-element row, where array_distinct keeps one null)
    assert(pairs.filter(!($"merge" <=> $"ref")).isEmpty)
    // and the null-array row really does propagate null
    assert(pairs.filter($"ia" === 4L || $"ib" === 4L)
      .filter($"merge".isNotNull).isEmpty)
  }

  test("the kernel stays inside whole-stage codegen") {
    GraftFunctions.register(spark)
    // non-foldable input (a literal Seq constant-folds to LocalTableScan)
    val df = spark.range(8).select($"id",
      prep(split(concat($"id".cast("string"), lit(" a b")), " ")).as("__s"))
    val plan = df.select(
      GraftFunctions.sortedInterCount($"__s", $"__s").as("n"))
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix marks a WholeStageCodegen stage; the interpreted
    // array_sort HOF below it keeps the stages apart, so assert on the
    // kernel's own Project line
    val kernelLine = plan.linesIterator
      .find(_.contains("graft_sorted_inter_count")).getOrElse("")
    assert(kernelLine.trim.startsWith("*("),
      s"expected the kernel's Project inside whole-stage codegen, got:\n$plan")
  }
}
