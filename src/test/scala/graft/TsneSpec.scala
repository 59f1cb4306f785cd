package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ml.Tsne

class TsneSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** 3 well-separated Gaussian blobs in 10-D, 40 points each. */
  private def blobs(): (Array[Array[Double]], Array[Int]) = {
    val rnd = new scala.util.Random(7)
    val centers = Array(
      Array.fill(10)(0.0),
      Array.tabulate(10)(i => if (i % 2 == 0) 10.0 else 0.0),
      Array.tabulate(10)(i => if (i % 2 == 1) -10.0 else 0.0))
    val pts = Array.newBuilder[Array[Double]]
    val labels = Array.newBuilder[Int]
    for (c <- centers.indices; _ <- 0 until 40) {
      pts += centers(c).map(_ + rnd.nextGaussian() * 0.5)
      labels += c
    }
    (pts.result(), labels.result())
  }

  test("tsne separates planted clusters and is deterministic") {
    val (x, labels) = blobs()
    val cfg = Tsne.Config(maxIterations = 400, minIterations = 150,
      perplexity = 15.0, seed = 11L)
    val y1 = Tsne.fit(x, cfg)
    val y2 = Tsne.fit(x, cfg)
    assert(y1.length == x.length && y1.head.length == 2)
    // deterministic: same seed → bit-identical embedding
    assert(y1.zip(y2).forall { case (a, b) => a.sameElements(b) })

    def dist(a: Array[Double], b: Array[Double]): Double =
      math.sqrt(a.zip(b).map { case (u, v) => (u - v) * (u - v) }.sum)
    val pairs = for {
      i <- x.indices; j <- x.indices if i < j
    } yield (labels(i) == labels(j), dist(y1(i), y1(j)))
    val intra = pairs.filter(_._1).map(_._2)
    val inter = pairs.filterNot(_._1).map(_._2)
    val meanIntra = intra.sum / intra.size
    val meanInter = inter.sum / inter.size
    // clusters must be far tighter than the gaps between them
    assert(meanIntra < meanInter * 0.5,
      s"intra $meanIntra vs inter $meanInter")
  }

  test("train returns a DataFrame and embedRow lands in the right cluster") {
    val (x, labels) = blobs()
    val df = spark.createDataFrame(
      x.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq, labels(i)) }.toSeq)
      .toDF("id", "vec", "label")
    val (emb, model) = Tsne.train(df, "id", "vec",
      Tsne.Config(maxIterations = 300, minIterations = 100,
        perplexity = 15.0, seed = 11L))
    assert(emb.count() == x.length)
    assert(emb.schema("embedding").dataType.typeName == "array")

    // a fresh point near cluster-1's center must embed near cluster-1
    val probe = Array.tabulate(10)(i => if (i % 2 == 0) 10.2 else 0.1)
    val at = model.embedRow(probe)
    def dist(a: Array[Double], b: Array[Double]): Double =
      math.sqrt(a.zip(b).map { case (u, v) => (u - v) * (u - v) }.sum)
    val byCluster = labels.distinct.map { c =>
      val members = x.indices.filter(labels(_) == c)
      val cx = Array.tabulate(2)(d => members.map(model.outputs(_)(d)).sum / members.size)
      c -> dist(at, cx)
    }.toMap
    assert(byCluster(1) < byCluster(0) && byCluster(1) < byCluster(2),
      s"probe distances $byCluster")
    // exact training point → its own coordinates
    assert(model.embedRow(x(5)).sameElements(model.outputs(5)))
  }
}
