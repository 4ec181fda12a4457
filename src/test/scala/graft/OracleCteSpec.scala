package graft

import org.scalatest.funsuite.AnyFunSuite

/** DuckDB-oracle CTE inlining guard (r15 verdict item 7).
  *
  * DuckDB inlines CTE references, so an iterative trainer chain whose
  * round-k CTEs reference round k−1 more than once compounds
  * exponentially unless the chain is `AS MATERIALIZED` (measured
  * 109 s → 10.7 s on the k-means oracle when this was first hit; a
  * regression surfaces as a driver-side verify TIMEOUT, not a diff —
  * the one failure mode the correctness gate cannot attribute). This
  * spec statically computes, for every CTE in every oracle, how many
  * times it would be evaluated under inline-everything semantics —
  * a MATERIALIZED CTE evaluates once and cuts the multiplication —
  * and bounds the result. The bound (8) is the corpus's current
  * worst honest case (dedup_semantic's size-normalizer pair); an
  * un-materialized trainer chain blows past it by orders of magnitude
  * (emb_whiten stripped of MATERIALIZED computes ~2.8e14). */
class OracleCteSpec extends AnyFunSuite {

  private case class Cte(name: String, materialized: Boolean, body: String)

  private val headRe =
    ("(?s)\\s*([A-Za-z_][A-Za-z0-9_]*)\\s*(\\([^)]*\\))?\\s+AS\\s+" +
      "(MATERIALIZED\\s+)?\\(").r

  /** Parses `WITH [RECURSIVE] a [(cols)] AS [MATERIALIZED] (...), …
    * <final>`; tracks single-quote strings and paren depth. None for
    * oracles without a WITH clause. */
  private def parse(sql: String): Option[(Seq[Cte], String)] = {
    val m = "(?s)\\bWITH\\b(\\s+RECURSIVE\\b)?".r
      .findFirstMatchIn(sql).getOrElse(return None)
    var i = m.end
    val ctes = Seq.newBuilder[Cte]
    while (true) {
      val h = headRe.findPrefixMatchOf(sql.substring(i)).getOrElse(
        return None)
      val name = h.group(1)
      val mat = h.group(3) != null
      val bodyStart = i + h.end
      var j = bodyStart
      var depth = 1
      var inQuote = false
      while (depth > 0) {
        sql.charAt(j) match {
          case '\'' => inQuote = !inQuote
          case '(' if !inQuote => depth += 1
          case ')' if !inQuote => depth -= 1
          case _ => ()
        }
        j += 1
      }
      ctes += Cte(name, mat, sql.substring(bodyStart, j - 1))
      val rest = sql.substring(j)
      if (rest.matches("(?s)\\s*,.*")) i = j + rest.indexOf(',') + 1
      else return Some((ctes.result(), rest))
    }
    None // unreachable
  }

  /** FROM/JOIN references of `name` inside `body`. */
  private def refs(body: String, name: String): Int =
    ("(?is)(?:FROM|JOIN)\\s+" + java.util.regex.Pattern.quote(name) + "\\b")
      .r.findAllMatchIn(body).size

  /** Cap: evaluation counts saturate here (the real numbers reach
    * ~1e14 on a stripped trainer chain — saturating keeps the
    * arithmetic in Long without changing any verdict). */
  private val Sat = 1000000L

  /** Evaluation count of each CTE under inline semantics: walking
    * back-to-front, a CTE is evaluated once per reference from the
    * final query plus, per later CTE that references it, that CTE's
    * own evaluation count (1 if it is MATERIALIZED; recursive
    * self-references are iterative in DuckDB, not inlined, and are
    * not counted). */
  private def evalCounts(ctes: Seq[Cte], finalQ: String): Map[String, Long] = {
    val w = scala.collection.mutable.Map.empty[String, Long]
    ctes.zipWithIndex.reverse.foreach { case (c, idx) =>
      var total: Long = refs(finalQ, c.name).toLong
      ctes.drop(idx + 1).foreach { later =>
        val r = refs(later.body, c.name)
        if (r > 0)
          total += r * (if (later.materialized) 1L else w(later.name))
      }
      w(c.name) = if (c.materialized) 1L else math.min(total, Sat)
    }
    w.toMap
  }

  private val InlineBound = 8L

  test("no oracle CTE would be inlined past the honest bound") {
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (qname, sql) =>
        parse(sql).toSeq.flatMap { case (ctes, finalQ) =>
          val counts = evalCounts(ctes, finalQ)
          ctes.filter(c => !c.materialized && counts(c.name) > InlineBound)
            .map(c => s"$qname/${c.name} (x${counts(c.name)})")
        }
    }
    assert(offenders.isEmpty,
      s"CTEs past the $InlineBound-evaluation inlining bound — mark the " +
        s"chain AS MATERIALIZED (DuckDB trainer-chain lesson): " +
        offenders.mkString(", "))
  }

  test("the guard itself detects an un-materialized trainer chain") {
    // strip MATERIALIZED from a real trainer oracle and assert the
    // metric explodes — the regression this spec exists to catch
    val sql = SparkEntry.oracleSql("emb_pca")
      .replaceAll("AS\\s+MATERIALIZED", "AS")
    val (ctes, finalQ) = parse(sql).get
    val counts = evalCounts(ctes, finalQ)
    val worst = ctes.filter(!_.materialized).map(c => counts(c.name)).max
    assert(worst > 1000L,
      s"expected exponential blowup without MATERIALIZED, got $worst")
  }

  test("every WITH-leading oracle parses into CTEs") {
    // parser coverage: a head shape this parser cannot read would
    // silently exempt its oracle from the bound above
    val unparsed = SparkEntry.oracleSql.collect {
      case (qname, sql)
          if sql.matches("(?is)\\s*WITH\\b.*") &&
            !parse(sql).exists(_._1.nonEmpty) => qname
    }
    assert(unparsed.isEmpty, s"oracles the CTE parser cannot read: $unparsed")
  }
}
