package graft.mapreduce

/** The reference's three applications expressed through the Maple/Juice
  * API — the same logic it ships as Go executables, used here both as
  * catalog queries and as the differential harness against the pure
  * DataFrame forms (the comparison the reference itself runs against
  * Hadoop, `mp3/src/hadoop_*`).
  */
object Workloads {

  /** `mp3/src/maple/wordcount.go:7-15`: emit (token, "1") per token. */
  object WordCountMaple extends Maple {
    def maple(line: String): IterableOnce[(String, String)] =
      line.split("\\s+").iterator.filter(_.nonEmpty).map(w => (w, "1"))
  }

  /** `mp3/src/juice/wordcount.go:7-15`: sum int values, skipping
    * unparseable ones (Atoi-or-skip, SURVEY §2.2 F4).
    */
  object WordCountJuice extends Juice {
    def juice(key: String, values: Iterator[String]): IterableOnce[(String, String)] = {
      val sum = values.flatMap(_.toLongOption).sum
      Iterator((key, sum.toString))
    }
  }

  /** `mp3/src/mj_wine/wine_maple.go:8-23` shape over the documents
    * table serialized as `lang,source,text` lines: filter lang == "en",
    * emit (source, "1") once per "hash" token OCCURRENCE.
    */
  object WineMaple extends Maple {
    def maple(line: String): IterableOnce[(String, String)] = {
      val parts = line.split(",", 3)
      if (parts.length < 3 || parts(0) != "en") Iterator.empty
      else parts(2).split("\\s+").iterator.filter(_ == "hash")
        .map(_ => (parts(1), "1"))
    }
  }

  /** Condorcet phase 1 map (`mp3/src/maple/condorcet_1.go:8-24`): for a
    * ranked ballot "c0,c1,...", emit one vote per candidate pair — key
    * "(min max)" by string order, value "1" iff the earlier-ranked
    * candidate is the string-smaller one.
    */
  object CondorcetMaple1 extends Maple {
    def maple(line: String): IterableOnce[(String, String)] = {
      val ranked = line.split(",").iterator.map(_.trim).filter(_.nonEmpty).toVector
      for {
        i <- ranked.indices.iterator
        j <- (i + 1) until ranked.size
      } yield {
        val (a, b) = (ranked(i), ranked(j))
        if (a < b) (s"($a $b)", "1") else (s"($b $a)", "0")
      }
    }
  }

  /** Condorcet phase 1 reduce (`mp3/src/juice/condorcet_1.go:3-20`):
    * majority per pair, ties to the string-smaller candidate; emit the
    * winning ordered pair "(w l)" with value "1".
    */
  object CondorcetJuice1 extends Juice {
    def juice(key: String, values: Iterator[String]): IterableOnce[(String, String)] = {
      var ones = 0L; var zeros = 0L
      values.foreach(v => if (v == "1") ones += 1 else zeros += 1)
      // key is "(a b)"; swap to "(b a)" when b wins the pairwise vote
      val inner = key.stripPrefix("(").stripSuffix(")").split(" ")
      val out = if (ones >= zeros) key else s"(${inner(1)} ${inner(0)})"
      Iterator((out, "1"))
    }
  }

  /** Condorcet phase 2 map (`mp3/src/maple/condorcet_2.go:3-6`): route
    * every pair-winner line to a single group via a constant key.
    */
  object CondorcetMaple2 extends Maple {
    def maple(line: String): IterableOnce[(String, String)] = {
      val t = line.trim
      if (t.length < 5) Iterator.empty else Iterator(("1", t))
    }
  }

  /** Reference-compat Condorcet phase 2 (`mp3/src/juice/condorcet_2.go`
    * reproduced EXACTLY, quirks and all): candidates are the single
    * digits 0..numCandidates-1 parsed from position 1 of the trimmed
    * pair string; a candidate with numCandidates-1 wins emits
    * `(digit, " is the condorcet winner!")` and stops; otherwise the
    * max-win set is emitted as a TRAILING-COMMA digit list with value
    * " have the highest condorcet counts, no winner.". Use
    * CondorcetJuice2 for the generalized semantics.
    */
  final class CondorcetJuice2Compat(numCandidates: Int = 10) extends Juice {
    def juice(key: String, values: Iterator[String]): IterableOnce[(String, String)] = {
      val votes = new Array[Int](numCandidates)
      values.foreach { v =>
        val trimmed = v.trim
        if (trimmed.length >= 5) {
          trimmed.charAt(1).toString.toIntOption
            .filter(i => i >= 0 && i < numCandidates)
            .foreach(votes(_) += 1)
        }
      }
      votes.indexWhere(_ == numCandidates - 1) match {
        case w if w >= 0 => Iterator((w.toString, " is the condorcet winner!"))
        case _ =>
          val maxCount = votes.max
          val winnerSet = votes.zipWithIndex.collect {
            case (v, i) if v == maxCount => s"$i,"
          }.mkString
          Iterator((winnerSet, " have the highest condorcet counts, no winner."))
      }
    }
  }

  /** Condorcet phase 2 reduce (`mp3/src/juice/condorcet_2.go:9-47`)
    * generalized past its hardcoded 10 single-char candidates: tally
    * pairwise wins per candidate from "(w l)" pairs; a candidate with
    * wins == numCandidates-1 is the Condorcet winner, otherwise report
    * the max-win set.
    */
  final class CondorcetJuice2(numCandidates: Int) extends Juice {
    def juice(key: String, values: Iterator[String]): IterableOnce[(String, String)] = {
      val wins = scala.collection.mutable.Map.empty[String, Long]
      values.foreach { v =>
        val inner = v.stripPrefix("(").stripSuffix(")").split(" ")
        if (inner.nonEmpty) wins.updateWith(inner(0)) {
          c => Some(c.getOrElse(0L) + 1)
        }
      }
      val maxWins = if (wins.isEmpty) 0L else wins.values.max
      wins.toSeq.sortBy(_._1).iterator.map { case (cand, n) =>
        val tag =
          if (n == numCandidates - 1) "condorcet_winner"
          else if (n == maxWins) "max_win_set"
          else "loser"
        (cand, s"$n,$tag")
      }
    }
  }
}
