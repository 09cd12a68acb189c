package graft.queries

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property check of the THEOREM q132's PPJoin positional filter relies
  * on (Dedup.scala): order every set by a GLOBAL total order
  * (document frequency, then value — both engines replay it); index the
  * first ⌊s/2⌋+1 elements ("prefix"). Then for every pair with Jaccard
  * ≥ 0.5:
  *   (a) the prefixes share an element (AllPairs), and
  *   (b) at the FIRST shared prefix element (positions p1, p2, 1-based)
  *       the remaining-overlap bound passes:
  *         3 · (1 + min(s1−p1, s2−p2)) ≥ s1 + s2.
  * The implementation drops candidate matches failing (b) BEFORE the
  * verification join, so if (b) could fail for a truly-similar pair the
  * join would silently lose results. ExactJaccardJoinSpec pins equality
  * on the fixture corpus; this spec pins the math on thousands of
  * adversarial random families, where hand-reasoning about truncated
  * prefixes and skewed frequencies is easiest to get wrong. */
class PpjoinPropertySpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], n: Int, seed: Long): List[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(seed))

  // families of small sets over a small universe → dense overlap, many
  // qualifying pairs, heavy df ties (the tie-break-by-value path)
  private val familyGen: Gen[List[Set[Int]]] = for {
    nSets <- Gen.choose(2, 12)
    sets <- Gen.listOfN(nSets, for {
      sz <- Gen.choose(1, 14)
      s <- Gen.listOfN(sz, Gen.choose(0, 19))
    } yield s.toSet)
  } yield sets

  test("J >= 0.5 pairs always share a prefix element passing the bound") {
    val families = sample(familyGen, 3000, 20240813L)
    var checkedPairs = 0
    families.foreach { sets =>
      // global order: (df, value) — df over THIS family, like the query
      val df = sets.flatten.groupBy(identity).view.mapValues(_.size).toMap
      def ordered(s: Set[Int]): Vector[Int] =
        s.toVector.sortBy(x => (df(x), x))
      for {
        i <- sets.indices; j <- sets.indices if i < j
        (a, b) = (sets(i), sets(j))
        inter = (a & b).size
        uni = (a | b).size
        if inter * 2 >= uni // Jaccard >= 0.5
      } {
        checkedPairs += 1
        val (oa, ob) = (ordered(a), ordered(b))
        val (pa, pb) = (oa.take(oa.size / 2 + 1), ob.take(ob.size / 2 + 1))
        val shared = pa.toSet & pb.toSet
        assert(shared.nonEmpty,
          s"AllPairs violated: J>=0.5 pair with disjoint prefixes a=$oa b=$ob")
        // first shared element under the global order
        val h = pa.find(shared.contains).get
        assert(ob.take(ob.size / 2 + 1).find(shared.contains).contains(h),
          "global total order must give BOTH prefixes the same first " +
            s"shared element, a=$oa b=$ob")
        val p1 = oa.indexOf(h) + 1
        val p2 = ob.indexOf(h) + 1
        val bound = 3L * (1L + math.min(oa.size - p1, ob.size - p2))
        assert(bound >= oa.size + ob.size,
          s"positional bound would drop a qualifying pair: a=$oa b=$ob " +
            s"h=$h p1=$p1 p2=$p2 inter=$inter uni=$uni")
      }
    }
    assert(checkedPairs > 1000, s"generator too weak: $checkedPairs pairs")
  }
}
