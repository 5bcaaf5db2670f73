package graft.sql

import graft.SparkSpec
import graft.recdb.MicroFixtureSpec
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll

/** Runs the reference's own regression script
  * (recdb_regression_test.sql) VERBATIM, statement by statement, through
  * an extension-enabled session — the strongest completeness statement the
  * SQL surface can make: a user of the reference can paste their test file
  * into this engine unchanged. The script is read from the reference tree
  * at runtime (never copied into this repo); the test cancels if the tree
  * is not mounted.
  *
  * Fixture: the micro ratings fixture exposed with the script's column
  * name (`ratingval`) plus the ml_items dimension table its join
  * statements reference.
  */
class RegressionFileSpec extends SparkSpec with BeforeAndAfterAll {

  private val ScriptPath =
    "/root/reference/PostgreSQL/recdb_regression_test.sql"

  lazy val ext: SparkSession = {
    SparkSpec.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val base = Files.createTempDirectory("graft-regfile").toString
    SparkSession.builder()
      .withExtensions(e => new GraftSqlExtensions()(e))
      .config(GraftSql.CatalogDirKey, s"$base/catalog")
      .config(GraftSql.ModelsDirKey, s"$base/models")
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    SparkSession.setDefaultSession(SparkSpec.session)
    SparkSession.setActiveSession(SparkSpec.session)
    super.afterAll()
  }

  test("the reference's recdb_regression_test.sql runs verbatim, end to end") {
    assume(Files.exists(Paths.get(ScriptPath)),
      s"reference tree not mounted at $ScriptPath")
    val sq = ext
    import sq.implicits._
    new MicroFixtureSpec {}.fixture.toDF("userid", "itemid", "ratingval")
      .createOrReplaceTempView("ml_ratings")
    Seq((1L, "Alpha", "classic drama film"), (2L, "Beta", "action thriller"),
      (3L, "Gamma", "courtroom drama"), (4L, "Delta", "comedy"))
      .toDF("itemid", "name", "genre").createOrReplaceTempView("ml_items")

    val raw = Files.readString(Paths.get(ScriptPath))
    val statements = raw
      .replaceAll("""(?s)/\*.*?\*/""", "") // strip block comments
      .split(';')
      .map(_.trim)
      .filter(_.nonEmpty)
    statements.length shouldBe 27 // 5 methods × 4 + (CREATE + 5 misc + DROP)

    var created = 0; var dropped = 0; var selects = 0
    statements.foreach { stmt =>
      withClue(s"statement: $stmt\n") {
        val out = ext.sql(stmt).collect()
        if (stmt.toUpperCase.startsWith("CREATE")) {
          created += 1
          GraftSql.catalog(ext).get("MovieRec").isDefined shouldBe true
        } else if (stmt.toUpperCase.startsWith("DROP")) {
          dropped += 1
          GraftSql.catalog(ext).get("MovieRec") shouldBe None
        } else {
          selects += 1
          if (stmt.contains(">= 4.5"))
            // score predicate: whether rows survive depends on the data;
            // what must hold is that every survivor satisfies it
            out.foreach(_.getDouble(2) should be >= 4.5)
          else out.length should be > 0
          // the single-user statements only emit that user's tuples
          if (stmt.contains("userid = 1") && !stmt.contains("r.userid"))
            out.map(_.getLong(0)).distinct.toSeq should
              (be(Seq(1L)) or be(Seq.empty))
          if (stmt.contains("ILIKE '%drama%'"))
            out.foreach(_.getString(3).toLowerCase should include("drama"))
          if (stmt.contains("ILIKE '%action%'"))
            out.foreach(_.getString(3).toLowerCase should include("action"))
        }
      }
    }
    (created, dropped, selects) shouldBe ((6, 6, 15))
  }
}
