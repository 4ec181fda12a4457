package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Join

/** Key-width gate for corpus-scale gram joins (r15 verdict item 2).
  *
  * A 100 TB corpus carries ~10¹⁰ distinct gram TYPES — past the ~5e9
  * birthday bound of a single 64-bit hash key, where a colliding type
  * silently merges counts (bigram score skew) or membership
  * (contamination flags). The repo's discipline (despan, r14) is the
  * two-seed PAIR (xxhash64(g), xxhash64(7, g)) ≈ 2⁻¹²⁸ two-sided
  * collision. This spec pins that every gram-keyed equi-join in the
  * three corpus-scale gram operators carries the second-seed twin next
  * to its primary key, so a future edit cannot quietly drop back to 64
  * bits, and that the pairing is not vacuous (the gram joins exist). */
class GramKeySpec extends SparkSpec {

  /** primary gram key → its mandatory second-seed twin */
  private val twins = Map(
    "g" -> "g2",    // contamination / decontaminate n-gram types
    "kb" -> "kb2",  // bigramLogprob bigram types
    "k1" -> "k1b",  // bigramLogprob left-unigram counts
    "k2" -> "k2b")  // bigramLogprob unigram vocabulary

  private def joinKeySets(df: DataFrame): Seq[Set[String]] =
    df.queryExecution.optimizedPlan.collect {
      case j: Join if j.condition.isDefined =>
        j.condition.get.references.map(_.name).toSet
    }

  private def assertPaired(df: DataFrame, name: String,
      expectGram: Set[String]): Unit = {
    val joins = joinKeySets(df)
    assert(joins.nonEmpty, s"$name: expected at least one join in the plan")
    joins.foreach { ks =>
      twins.foreach { case (a, b) =>
        if (ks.contains(a)) assert(ks.contains(b),
          s"$name: join keys $ks carry gram key '$a' without its " +
            s"second-seed twin '$b' — a 64-bit key on a corpus-scale " +
            "gram join (despan two-seed discipline, r14)")
      }
    }
    expectGram.foreach { a =>
      assert(joins.exists(_.contains(a)),
        s"$name: no join references gram key '$a' — the pairing gate " +
          "would be vacuous (did the join keys get renamed?)")
    }
  }

  test("contamination joins n-gram types on two-seed key pairs") {
    assertPaired(TrainingPrep.contamination(spark, sfDir),
      "contamination", Set("g"))
  }

  test("decontaminate joins n-gram types on two-seed key pairs") {
    assertPaired(TrainingPrep.decontaminate(spark, sfDir),
      "decontaminate", Set("g"))
  }

  test("bigramLogprob joins every gram table on two-seed key pairs") {
    // pin the artifact-BUILD plan (bigramScore): the public
    // bigramLogprob reads the stored score table once built (r17),
    // so its plan carries no gram joins to inspect
    assertPaired(TrainingPrep.bigramScore(spark, sfDir),
      "bigramLogprob", Set("kb", "k1", "k2"))
  }
}
