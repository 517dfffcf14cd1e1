package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (r13 optimization round): decompose one expensive bench row
  * into its stages with wall-clock timers, so optimization effort lands
  * on the stage that actually owns the time (guide §1: measure first).
  *
  * Usage: runMain graft.Profile <mode> [sfDir]
  */
object Profile {
  def time[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $name%-36s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("stream_curation")
    // one positional convention per mode (ADVICE r13): `query` takes
    // (mode, queryName[, dataDir]); every other mode (mode[, dataDir]).
    // Validate up front instead of surfacing a missing name as an
    // ArrayIndexOutOfBoundsException.
    if (mode == "query" && args.length < 2) {
      System.err.println("usage: Profile query <queryName> [dataDir]")
      sys.exit(2)
    }
    val DefaultDir = "/root/testdata/sf0.1"
    val d =
      if (mode == "query") { if (args.length > 2) args(2) else DefaultDir }
      else if (args.length > 1) args(1) else DefaultDir
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expressions.GraftFunctions.register(spark)

    mode match {
      case "stream_curation" => profileStreamCuration(spark, d)
      case "query" =>
        // time any declared query end-to-end, 3 reps after one warmup
        val name = args(1); val dir = d
        val fn = SparkEntry.queries.getOrElse(name, {
          System.err.println(s"unknown query '$name' — names are the" +
            " SparkEntry.queries keys (q_...)")
          sys.exit(2)
        })
        time(s"$name warmup")(fn(spark, dir).count())
        (1 to 3).foreach(i => time(s"$name rep$i")(fn(spark, dir).count()))
      case "streamfixed" =>
        import org.apache.spark.sql.streaming.Trigger
        val docs = spark.read.parquet(s"$d/documents.parquet")
        def replay(name: String, f: DataFrame => DataFrame): Unit = {
          val raw = spark.readStream.schema(docs.schema)
            .parquet(s"$d/{documents.parquet}")
            .withColumn("__ts",
              lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
          val ckpt = java.nio.file.Files.createTempDirectory(
            java.nio.file.Paths.get("/dev/shm"), "graft-probe")
          val q = f(raw).writeStream.queryName(name).format("memory")
            .outputMode("append").trigger(Trigger.AvailableNow())
            .option("checkpointLocation", ckpt.toString).start()
          q.awaitTermination()
          spark.table(name).count()
          spark.catalog.dropTempView(name)
        }
        (1 to 3).foreach { i =>
          time(s"stateless passthrough rep$i")(
            replay(s"probe_pt_$i", df => df.select("doc_id", "text")))
          time(s"dedupExact stateful rep$i")(
            replay(s"probe_dd_$i", df =>
              graft.streaming.StreamingOps.dedupExact(df, "text", "__ts", "0 seconds")))
        }
      case "corrplan" =>
        val fn = SparkEntry.queries("q_corr_matrix")
        (1 to 3).foreach { i =>
          val df = fn(spark, d)
          time(s"plan only rep$i")(df.queryExecution.executedPlan)
          time(s"execute rep$i")(df.count())
        }
        val fn2 = SparkEntry.queries("q_spearman")
        (1 to 3).foreach { i =>
          val df = fn2(spark, d)
          time(s"spearman plan only rep$i")(df.queryExecution.executedPlan)
          time(s"spearman execute rep$i")(df.count())
        }
      case "corr" =>
        val li = spark.read.parquet(s"$d/lineitem.parquet")
          .withColumn("valn", when(col("l_tax") === 0.0, lit(Double.NaN))
            .otherwise(col("l_quantity")))
        println(s"[profile] lineitem rows = ${li.count()}")
        time("scan count only")(li.selectExpr("count(l_extendedprice)").collect())
        val cols = Seq("valn", "l_extendedprice", "l_discount")
        (1 to 3).foreach { i =>
          time(s"corrMatrixBy decimal rep$i") {
            graft.operators.FeatureScaling.corrMatrixBy(
              li, Seq("l_returnflag"), cols).count()
          }
        }
        // timing-only variant: identical shape, double sums (inexact)
        (1 to 3).foreach { i =>
          time(s"corr double-sums rep$i") {
            val pairs = for { a <- cols.indices; b <- (a+1) until cols.size } yield (a,b)
            val aggs = pairs.flatMap { case (a, b) =>
              val x0 = when(!isnan(col(cols(a))), col(cols(a)))
              val y0 = when(!isnan(col(cols(b))), col(cols(b)))
              val xn = when(y0.isNotNull, x0); val yn = when(x0.isNotNull, y0)
              Seq(count(xn).as(s"n_${a}_$b"), sum(xn).as(s"sx_${a}_$b"),
                sum(yn).as(s"sy_${a}_$b"), sum(xn*yn).as(s"sxy_${a}_$b"),
                sum(xn*xn).as(s"sxx_${a}_$b"), sum(yn*yn).as(s"syy_${a}_$b"))
            }
            li.groupBy(col("l_returnflag")).agg(aggs.head, aggs.tail: _*).count()
          }
        }
        (1 to 2).foreach { i =>
          time(s"spearman rep$i") {
            graft.operators.FeatureScaling.corrMatrixSpearmanBy(
              li.drop("valn"), Seq("l_returnflag"),
              Seq("l_quantity", "l_extendedprice", "l_discount")).count()
          }
        }
        // honest timing (guide §1.4): collect() the 9-row result so the
        // optimizer cannot prune the aggregate expressions (count() did)
        val cols2 = Seq("valn", "l_extendedprice", "l_discount")
        (1 to 3).foreach { i =>
          time(s"decimal agg COLLECT rep$i") {
            graft.operators.FeatureScaling.corrMatrixBy(
              li, Seq("l_returnflag"), cols2).collect()
          }
          time(s"double agg COLLECT rep$i") {
            val pairs = for { a <- cols2.indices; b <- (a+1) until cols2.size } yield (a,b)
            val aggs = pairs.flatMap { case (a, b) =>
              val x0 = when(!isnan(col(cols2(a))), col(cols2(a)))
              val y0 = when(!isnan(col(cols2(b))), col(cols2(b)))
              val xn = when(y0.isNotNull, x0); val yn = when(x0.isNotNull, y0)
              Seq(count(xn).as(s"n_${a}_$b"), sum(xn).as(s"sx_${a}_$b"),
                sum(yn).as(s"sy_${a}_$b"), sum(xn*yn).as(s"sxy_${a}_$b"),
                sum(xn*xn).as(s"sxx_${a}_$b"), sum(yn*yn).as(s"syy_${a}_$b"))
            }
            li.groupBy(col("l_returnflag")).agg(aggs.head, aggs.tail: _*).collect()
          }
          time(s"long-scaled agg COLLECT rep$i") {
            val pairs = for { a <- cols2.indices; b <- (a+1) until cols2.size } yield (a,b)
            def sc(c: String) = when(!isnan(col(c)), (col(c) * 100.0)).cast("long")
            val aggs = pairs.flatMap { case (a, b) =>
              val x0 = sc(cols2(a)); val y0 = sc(cols2(b))
              val xn = when(y0.isNotNull, x0); val yn = when(x0.isNotNull, y0)
              Seq(count(xn).as(s"n_${a}_$b"), sum(xn).as(s"sx_${a}_$b"),
                sum(yn).as(s"sy_${a}_$b"), sum(xn*yn).as(s"sxy_${a}_$b"),
                sum(xn*xn).as(s"sxx_${a}_$b"), sum(yn*yn).as(s"syy_${a}_$b"))
            }
            li.groupBy(col("l_returnflag")).agg(aggs.head, aggs.tail: _*).collect()
          }
        }
      case other => sys.error(s"unknown profile mode: $other")
    }
    spark.stop()
  }

  private def profileStreamCuration(s: SparkSession, d: String): Unit = {
    import graft.streaming.StreamingOps
    val EvalSrc = Seq("eval_hold", "benchmark")
    def T(name: String): DataFrame = s.read.parquet(s"$d/$name.parquet")
    val base = T("documents")
    val evalDocs = base
      .where(col("text").isNotNull && col("source").isin(EvalSrc: _*))

    // run the declared query once, untimed, to warm JIT/codegen and the
    // seed/days caches, then time the parts
    time("q_stream_curation warmup (full)") {
      SparkEntry.queries("q_stream_curation")(s, d).count()
    }

    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      val dir = time("seededRunDir copy") {
        LlmQueries.seededRunDir(d, "curation-seed")(t =>
          StreamingOps.curationSeed(
            base.limit(0), evalDocs, EvalSrc, t, "doc_id", "text"))
      }
      val days = time("stageDays") {
        LlmQueries.stageDays(d, "curation", Seq(
          base.where(col("doc_id") < 170),
          base.where(col("doc_id") >= 170 && col("doc_id") < 340),
          base.where(col("doc_id") >= 340)))
      }
      // batch-mode replay of the same three day files through the same
      // per-batch body — isolates streaming machinery from batch work
      val evalGrams = time("evalGramTable checkpoint") {
        graft.operators.NgramOverlap
          .evalGramTable(evalDocs, "doc_id", "text", n = 5)
          .localCheckpoint()
      }
      val dayFiles = new java.io.File(days).listFiles().filter(
        _.getName.endsWith(".parquet")).sortBy(_.getName)
      dayFiles.zipWithIndex.foreach { case (f, i) =>
        val b = s.read.parquet(f.toString)
        time(s"curationBatchAppend day$i") {
          StreamingOps.curationBatchAppend(b, dir, evalGrams, EvalSrc,
            "doc_id", "text", 0.5, 5)
        }
      }
      time("rollup over decon dir") {
        val last = s.read.parquet(s"$dir/decon")
        val sampled = graft.operators.Sampling.tokenBudgetSample(
          last.withColumn("toks", size(split(col("text"), " ")).cast("long")),
          "source", "toks", budget = 8000L,
          weights = LlmQueries.TokenBudgetWeights,
          key = graft.operators.Sampling.textKey(col("text")), salt = 9)
        graft.operators.Layout.shardAssign(sampled,
            graft.operators.Sampling.textKey(col("text")), shards = 8, salt = 11)
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"), sum("toks").as("sum_tokens"),
            sum(graft.operators.Sampling.textKey(col("text"))).as("checksum"))
          .orderBy("shard").count()
      }
      // and the full declared query again for the end-to-end number
      time("q_stream_curation full") {
        SparkEntry.queries("q_stream_curation")(s, d).count()
      }
      // fine-grained: one more fresh dir, day2 replayed with the batch
      // body's stages timed individually
      val dir2 = LlmQueries.seededRunDir(d, "curation-seed")(_ => ())
      dayFiles.dropRight(1).foreach { f =>
        StreamingOps.curationBatchAppend(s.read.parquet(f.toString), dir2,
          evalGrams, EvalSrc, "doc_id", "text", 0.5, 5)
      }
      profileBatchBody(s, s.read.parquet(dayFiles.last.toString), dir2,
        evalGrams, EvalSrc)
    }
  }

  /** [[graft.streaming.StreamingOps.curationBatchAppend]] with a timer
    * around each stage (kept in lockstep manually; dev-only). */
  private def profileBatchBody(
      spark: SparkSession,
      batch: DataFrame,
      dir: String,
      evalGrams: DataFrame,
      evalSources: Seq[String]): Unit = {
    import graft.operators.{Dedup, NgramOverlap, TextAnalysis}
    val idCol = "doc_id"; val textCol = "text"
    val threshold = 0.5; val ngram = 5
    val base = batch.where(col(textCol).isNotNull)
    val passed = TextAnalysis.gopherFlags(base, textCol)
      .where(col("gopher_pass"))
      .select(base.columns.map(col).toIndexedSeq: _*)
    val withCanon = passed.withColumn("__canon",
      TextAnalysis.normalizeText(col(textCol)))
    val exBatch = Dedup.dropDuplicatesKeepFirst(withCanon, idCol, "__canon")
    val exNew = time("  3a left_anti canon + localCkpt") {
      exBatch
        .join(spark.read.parquet(s"$dir/canon"), Seq("__canon"), "left_anti")
        .localCheckpoint()
    }
    time("  3b append canon") {
      exNew.select("__canon").write.mode("append").parquet(s"$dir/canon")
    }
    val exDocs = exNew.drop("__canon")
    val idx = time("  4a NearDupIndex.read")(Dedup.NearDupIndex.read(spark, dir))
    val surv = time("  4b dedupIncrementalNear + ckpt") {
      Dedup.dedupIncrementalNear(idx, exDocs, idCol, textCol, threshold)
        .localCheckpoint()
    }
    val add = Dedup.buildNearDupIndex(exDocs, idCol, textCol,
      idx.n, idx.bands, idx.rows)
    time("  4c append buckets") {
      add.buckets.write.mode("append").parquet(s"$dir/buckets")
    }
    time("  4d append shingles") {
      add.shingles.write.mode("append").parquet(s"$dir/shingles")
    }
    val trainB = surv.where(!col("source").isin(evalSources: _*))
    val contam = time("  5a contaminatedDocsPre") {
      NgramOverlap.contaminatedDocsPre(trainB, evalGrams,
          idCol, textCol, n = ngram, broadcastEval = true)
        .select(col(idCol).as("__contam_id"))
    }
    val deconB = time("  5b left_anti + ckpt") {
      trainB.join(contam, col(idCol) === col("__contam_id"), "left_anti")
        .localCheckpoint()
    }
    time("  6 append decon") {
      deconB.write.mode("append").parquet(s"$dir/decon")
    }
  }
}
