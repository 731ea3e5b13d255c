package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class ClusterExemplarSpec extends SparkSpecBase {

  test("clusterExemplars keeps the argmax-score doc per transitive cluster") {
    val s = spark
    import s.implicits._
    // chain 1-2-3 is ONE cluster; 4 and 5 are singletons
    val docs = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("i", "j")
    val scores = Seq((1L, 0.5), (2L, 0.9), (3L, 0.7), (4L, 0.1), (5L, 0.8))
      .toDF("doc", "score")
    val out = Dedup.clusterExemplars(docs, pairs, scores)
      .orderBy($"doc")
      .as[(Long, Long, Long, Int)].collect()
    assert(out.toSeq == Seq(
      (1L, 1L, 2L, 0), // cluster labeled by min id, exemplar is doc 2
      (2L, 1L, 2L, 1),
      (3L, 1L, 2L, 0),
      (4L, 4L, 4L, 1), // singletons keep themselves
      (5L, 5L, 5L, 1)))
  }

  test("partial scores: unscored docs still emit rows and never beat " +
    "a scored doc (inner-join would silently drop them)") {
    val s = spark
    import s.implicits._
    // cluster {1,2}: doc 2 scored, doc 1 not → exemplar is 2;
    // doc 3: UNSCORED singleton — must still appear, kept
    val docs = Seq(1L, 2L, 3L).toDF("doc_id")
    val pairs = Seq((1L, 2L)).toDF("i", "j")
    val scores = Seq((2L, 0.1)).toDF("doc", "score")
    val out = Dedup.clusterExemplars(docs, pairs, scores)
      .orderBy($"doc").as[(Long, Long, Long, Int)].collect()
    assert(out.toSeq == Seq(
      (1L, 1L, 2L, 0), // unscored, loses to the scored doc 2
      (2L, 1L, 2L, 1),
      (3L, 3L, 3L, 1))) // unscored singleton: present, kept
  }

  test("score ties break to the lowest doc id") {
    val s = spark
    import s.implicits._
    val docs = Seq(7L, 9L).toDF("doc_id")
    val pairs = Seq((7L, 9L)).toDF("i", "j")
    val scores = Seq((7L, 0.5), (9L, 0.5)).toDF("doc", "score")
    val keep = Dedup.clusterExemplars(docs, pairs, scores)
      .filter($"kept" === 1).select($"doc").as[Long].collect().toSeq
    assert(keep == Seq(7L))
  }
}
