package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches.Hll

/** HyperLogLog register sketch: accuracy vs truth on fixture shingles,
  * exact partition invariance of the register table, the element-wise
  * MAX merge law (sketch(A ∪ B) = merge(sketch(A), sketch(B))), the
  * linear-counting small-range branch, NULL-key skipping, and the
  * empty-corpus zero. */
class HllSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def shingles = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(split(col("text"), " ").as("t"))
    .filter(size(col("t")) >= 3)
    .select(explode(transform(sequence(lit(1), size(col("t")) - 2),
      i => concat_ws("_", element_at(col("t"), i),
        element_at(col("t"), i + 1), element_at(col("t"), i + 2)))).as("tok3"))

  test("estimate lands within 3 sigma of the exact distinct count") {
    val sh = shingles.persist()
    val truth = sh.agg(countDistinct(col("tok3"))).head().getLong(0).toDouble
    val est = Hll.distinctText(sh, col("tok3")).head().getDouble(3)
    sh.unpersist()
    val relErr = math.abs(est - truth) / truth
    // sigma = 1.04 / sqrt(512) ~= 4.6%; 3 sigma ~= 13.8%
    assert(relErr <= 0.138, f"relative error $relErr%.4f (est $est vs $truth)")
  }

  test("register table is exactly partition-invariant") {
    def regs(parts: Int) =
      Hll.registers(shingles.repartition(parts), col("tok3"))
        .orderBy("idx").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(regs(1) == regs(16))
  }

  test("merge law: registers(A union B) == merge(registers(A), registers(B))") {
    import spark.implicits._
    val a = (1 to 4000).map(i => s"a_$i").toDF("k")
    val b = (2000 to 6000).map(i => s"a_$i").toDF("k") // overlapping
    val direct = Hll.registers(a.unionByName(b), col("k"))
      .orderBy("idx").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val merged = Hll.merge(Hll.registers(a, col("k")), Hll.registers(b, col("k")))
      .orderBy("idx").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(direct == merged)
    // and the merged estimate equals the direct estimate exactly
    val eDirect = Hll.estimate(Hll.registers(a.unionByName(b), col("k"))).head()
    val eMerged = Hll.estimate(Hll.merge(
      Hll.registers(a, col("k")), Hll.registers(b, col("k")))).head()
    assert(eDirect == eMerged)
  }

  test("small cardinalities take the linear-counting branch and stay accurate") {
    import spark.implicits._
    val df = (1 to 100).map(i => s"key_$i").toDF("k")
    val row = Hll.estimate(Hll.registers(df, col("k"))).head()
    val (vZero, est) = (row.getInt(1), row.getDouble(3))
    assert(vZero > 0, "100 keys cannot fill all 512 registers")
    assert(math.abs(est - 100.0) / 100.0 <= 0.10, s"linear-counting est $est")
  }

  test("per-group sketches roll up: merging group registers equals the global sketch") {
    import spark.implicits._
    import graft.operators.Sketches
    val df = (1 to 3000).map(i => (s"g${i % 3}", s"key_$i")).toDF("src", "k")
    val global = Hll.estimate(Hll.registers(df, col("k"))).head()
    // rebuild the global from the three per-group register tables
    val perGroup = (0 to 2).map(g =>
      Hll.registers(df.filter(col("src") === s"g$g"), col("k")))
    val merged = Hll.estimate(perGroup.reduce(Hll.merge)).head()
    assert(merged == global, s"rollup $merged != global $global")
    // and the grouped aggregator arm matches per-group register math
    val grouped = Sketches.hllGroupedText(df, col("src"), col("k"))
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val direct = (0 to 2).map { g =>
      val e = Hll.estimate(perGroup(g)).head()
      (s"g$g", e.getInt(1), e.getLong(2), e.getDouble(3))
    }
    assert(grouped == direct, s"$grouped != $direct")
    // the one-pass grouped register build + n-way merge is the same
    // roll-up (the q_hll_union path): register-for-register equality
    val viaBy = Hll.mergeAll(Hll.registersBy(df, col("src"), col("k")))
      .orderBy("idx").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val viaGlobal = Hll.registers(df, col("k"))
      .orderBy("idx").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(viaBy == viaGlobal, "registersBy + mergeAll must equal the global build")
  }

  test("NULL keys are skipped; empty corpus estimates 0") {
    import spark.implicits._
    val withNulls = Seq(Some("x"), None, Some("y"), None).toDF("k")
    val regs = Hll.registers(withNulls, col("k"))
    assert(regs.count() <= 2) // only the two real keys register
    val empty = Hll.estimate(Hll.registers(
      Seq.empty[String].toDF("k"), col("k"))).head()
    assert(empty.getInt(1) == Hll.M && empty.getDouble(3) == 0.0, s"$empty")
  }
}
