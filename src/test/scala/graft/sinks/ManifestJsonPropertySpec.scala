package graft.sinks

import java.nio.file.Files

import graft.TestSpark
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property fuzz over the manifest's hand-rolled JSON codec through the
  * catalog's public surface: arbitrary (router-legal) table names and
  * part-file names committed across add/removed versions must fold back
  * exactly — a codec bug here is silent data loss at the warehouse
  * layer (fixed seed; generators sampled directly). */
class ManifestJsonPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sample[A](g: Gen[A], n: Int): List[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(7L))

  // the router's identifier policy (ClickHouseSql.ident): alnum + _ -,
  // not starting with '-'
  private val tableGen: Gen[String] = for {
    h <- Gen.alphaNumChar
    t <- Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const('_'),
      Gen.const('-'))).map(_.take(20))
  } yield (h :: t).mkString

  private val fileGen: Gen[String] = for {
    uuid <- Gen.listOfN(8, Gen.alphaNumChar).map(_.mkString)
    part <- Gen.choose(0, 99)
  } yield f"part-$part%05d-$uuid.snappy.parquet"

  test("random add/removed version streams fold back exactly (40 logs)") {
    val logGen = for {
      nTables <- Gen.choose(1, 4)
      tables <- Gen.listOfN(nTables, tableGen).map(_.distinct)
      nVersions <- Gen.choose(1, 12)
      versions <- Gen.listOfN(nVersions, for {
        t <- Gen.oneOf(tables)
        files <- Gen.nonEmptyListOf(fileGen).map(_.distinct.take(4))
      } yield t -> files)
    } yield (tables, versions)

    sample(logGen, 40).foreach { case (_, versions) =>
      val cat = new ManifestCatalog(spark,
        Files.createTempDirectory("mprop").toString, checkpointInterval = 5)
      // model: expected per-table file lists + per-file stats under the
      // same fold rules (stats follow their files; removal drops them)
      val model = scala.collection.mutable.Map.empty[String, Vector[String]]
      val statsModel =
        scala.collection.mutable.Map.empty[(String, String), (String, String)]
      def mkStats(t: String, files: Seq[String], i: Int) =
        if (i % 2 == 0) {
          files.foreach(f => statsModel((t, f)) = (s"$i", s"${i + 10}"))
          files.map(f => s"$t/$f" -> java.util.Base64.getEncoder
            .encodeToString(s"k\t$i\t${i + 10}".getBytes("UTF-8"))).toMap
        } else Map.empty[String, String]
      versions.zipWithIndex.foreach { case ((t, files), i) =>
        val existing = model.getOrElse(t, Vector.empty)
        if (i % 3 == 2 && existing.nonEmpty) {
          // a compaction-shaped version: consume current files, add new
          cat.commitVersion(None, add = Map(t -> files),
            removed = Map(t -> existing), stats = mkStats(t, files, i))
          existing.foreach(f => statsModel.remove((t, f)))
          model(t) = files.toVector
        } else {
          val fresh = files.filterNot(existing.contains)
          cat.commitVersion(Some(i.toLong), Map(t -> fresh),
            stats = mkStats(t, fresh, i))
          model(t) = existing ++ fresh
        }
      }
      model.foreach { case (t, expect) =>
        assert(cat.fileCount(t) == expect.size,
          s"table $t: expected ${expect.size} files, got ${cat.fileCount(t)}")
        val folded = cat.fileStats(t)
        val want = statsModel.collect {
          case ((`t`, f), (mn, mx)) => f -> Map("k" -> (mn, mx))
        }.toMap
        assert(folded == want, s"table $t: stats fold diverged")
      }
      assert(cat.listTables() == model.keys.toSeq.sorted)
    }
  }
}
