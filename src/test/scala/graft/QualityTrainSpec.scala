package graft

import graft.operators.TextOps

/** q192 in-engine perceptron training: full driver-side replay of the
  * batch-perceptron epochs (features, margins, updates, pocket pick)
  * in straight-line Scala against the engine's report.
  */
class QualityTrainSpec extends SparkSpec {

  private def md5Bucket(tok: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(tok.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 15)
    (java.lang.Long.parseLong(hex, 16) % 32).toInt
  }

  private def reference(d: String): Seq[(Long, Long, Long, Long, Long, Long)] = {
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text", "lang").collect()
      .map { r =>
        val toks = r.getString(1).split("\\s+", -1)
        val x = Array.fill(33)(0L)
        toks.foreach(t => x(md5Bucket(t)) += 1L)
        x(32) = 1L
        (r.getLong(0), if (r.getString(2) == "en") 1L else -1L, x)
      }
    val train = docs.filter(_._1 % 5 != 0)
    val test = docs.filter(_._1 % 5 == 0)
    def dot(w: Array[Long], x: Array[Long]): Long =
      w.indices.map(i => w(i) * x(i)).sum
    def errs(pop: Array[(Long, Long, Array[Long])], w: Array[Long]): Long =
      pop.count { case (_, y, x) => y * dot(w, x) <= 0 }.toLong
    var w = Array.fill(33)(0L)
    val snaps = (1 to 3).map { e =>
      val mis = train.filter { case (_, y, x) => y * dot(w, x) <= 0 }
      val nMiscl = mis.length.toLong
      val delta = Array.fill(33)(0L)
      mis.foreach { case (_, y, x) =>
        x.indices.foreach(i => delta(i) += y * x(i)) }
      w = w.indices.map(i => w(i) + delta(i)).toArray
      (e.toLong, nMiscl, errs(test, w), w)
    }
    val trainErrOf = snaps.map { case (e, _, _, wE) => e -> errs(train, wE) }.toMap
    val pocket = snaps.map { case (e, _, _, _) => (trainErrOf(e), e) }.min._2
    val p = snaps(pocket.toInt - 1)
    val nTr = train.length.toLong; val nTe = test.length.toLong
    val rows = snaps.map { case (e, nm, te, wE) =>
      (e, nTr, nm, nm * 1000L / nTr, te * 1000L / nTe, wE.map(math.abs).sum)
    }
    ((-1L, nTr, trainErrOf(pocket), trainErrOf(pocket) * 1000L / nTr,
      p._3 * 1000L / nTe, p._4.map(math.abs).sum)) +: rows
  }

  test("q192 matches a driver-side perceptron replay on driver data") {
    val got = TextOps.defs("q192_quality_train")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1)
    val want = reference(sfDir).sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  test("q199 data map matches a driver-side snapshot-scoring replay") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang", "source").collect()
      .map { r =>
        val toks = r.getString(1).split("\\s+", -1)
        val x = Array.fill(33)(0L)
        toks.foreach(t => x(md5Bucket(t)) += 1L)
        x(32) = 1L
        (r.getLong(0), if (r.getString(2) == "en") 1L else -1L, x,
          r.getString(3))
      }
    val train = docs.filter(_._1 % 5 != 0)
    def dot(w: Array[Long], x: Array[Long]): Long =
      w.indices.map(i => w(i) * x(i)).sum
    var w = Array.fill(33)(0L)
    val snaps = (1 to 3).map { _ =>
      val mis = train.filter { case (_, y, x, _) => y * dot(w, x) <= 0 }
      val delta = Array.fill(33)(0L)
      mis.foreach { case (_, y, x, _) =>
        x.indices.foreach(i => delta(i) += y * x(i)) }
      w = w.indices.map(i => w(i) + delta(i)).toArray
      w
    }
    val cells = train.map { case (_, y, x, src) =>
      (src, snaps.count(s => y * dot(s, x) > 0).toLong, y)
    }
    val bySrcAll = cells.groupBy(_._1).toSeq ++
      Seq("__all__" -> cells)
    val want = bySrcAll.flatMap { case (src, xs) =>
      val total = xs.length.toLong
      xs.groupBy(_._2).map { case (nc, g) =>
        (src, nc, g.length.toLong,
          g.count(_._3 == 1L).toLong, g.length.toLong * 1000 / total)
      }
    }.sortBy(x => (x._1, x._2))
    val got = TextOps.defs("q199_data_map")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want)
  }

  test("q200's trained gate reconciles with a driver-side replay") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang").collect()
      .map { r =>
        val toks = r.getString(1).split("\\s+", -1)
        val x = Array.fill(33)(0L)
        toks.foreach(t => x(md5Bucket(t)) += 1L)
        x(32) = 1L
        (r.getLong(0), if (r.getString(2) == "en") 1L else -1L, x,
          r.getString(1))
      }
    val train = docs.filter(_._1 % 5 != 0)
    def dot(w: Array[Long], x: Array[Long]): Long =
      w.indices.map(i => w(i) * x(i)).sum
    var w = Array.fill(33)(0L)
    val snaps = (1 to 3).map { _ =>
      val mis = train.filter { case (_, y, x, _) => y * dot(w, x) <= 0 }
      val delta = Array.fill(33)(0L)
      mis.foreach { case (_, y, x, _) =>
        x.indices.foreach(i => delta(i) += y * x(i)) }
      w = w.indices.map(i => w(i) + delta(i)).toArray
      w
    }
    val wavg = snaps.transpose.map(_.sum).toArray
    val trposDots = train.filter(_._2 == 1L)
      .map(t => (dot(wavg, t._3), t._1)).sorted
    val k = ((trposDots.length + 9) / 10)
    val t = trposDots(k - 1)._1
    val accepted = docs.filter(d => dot(wavg, d._3) >= t).map(_._1).toSet
    // >= 90% of train positives clear the calibrated threshold
    val kept = trposDots.count(_._1 >= t)
    assert(kept * 10 >= trposDots.length * 9)
    // the report's per-lang filter drops equal the replayed gate's
    val keepIds = docs.groupBy(_._4).values.map(_.map(_._1).min).toSet
    val langOf = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val dropByLang = docs.filter(d => keepIds(d._1) && !accepted(d._1))
      .groupBy(d => langOf(d._1)).view.mapValues(_.length.toLong).toMap
    val got = graft.operators.PipelineOps
      .defs("q200_trained_filter_release")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    got.foreach { case (lang, nDrop) =>
      assert(nDrop == dropByLang.getOrElse(lang, 0L), lang)
    }
  }

  test("epoch 1 misclassifies everything and the pocket is the argmin") {
    val rows = TextOps.defs("q192_quality_train")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(5)))).toMap
    assert(rows(1L)._1 == TextOps.defs("q192_quality_train")(spark, sfDir)
      .collect().find(_.getLong(0) == 1L).get.getLong(1)) // n_miscl == n_train
    // the pocket row's weights checksum matches one of the epochs
    assert(Seq(1L, 2L, 3L).map(rows).map(_._2).contains(rows(-1L)._2))
  }
}
