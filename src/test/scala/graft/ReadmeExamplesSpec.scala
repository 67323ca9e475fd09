package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row

import graft.functions.GraftFunctions

/** The reference README's six numbered usage examples
  * (`/root/reference/README.md:160-287`) asserted end-to-end through the
  * SQL surface with pinned outputs.
  *
  * Where the README prints illustrative result strings, they are
  * approximate prose, not goldens — e.g. it abbreviates the BLS category
  * "Secondary School Teachers, Except Special and Career/Technical
  * Education" to "Secondary School Teachers", and guesses "Registered
  * Nurse" where the TF-IDF argmax over the bundled dictionary (the
  * algorithm the reference implements) selects the closer alias "ICU
  * Nurse". The binding cross-engine goldens are the reference's own
  * sqllogictest vectors (`/root/reference/test/sql/title_mapper.test`,
  * all green in Snapshot104Spec/q52); THIS spec pins the actual behavior
  * of every README query shape so drift in any of them is caught.
  */
class ReadmeExamplesSpec extends AnyFunSuite {
  import SparkSuiteBase.spark

  private def setup(): Unit = {
    GraftFunctions.register(spark)
    spark.sql("DROP VIEW IF EXISTS standardized_jobs")
    spark.sql("DROP TABLE IF EXISTS job_postings")
    spark.sql(
      """CREATE TABLE job_postings (id INT, original_title STRING,
        |  company STRING, industry STRING) USING parquet""".stripMargin)
    spark.sql(
      """INSERT INTO job_postings VALUES
        |  (1, 'Sr Software Engineer - Backend', 'TechCorp', 'Technology'),
        |  (2, 'Registered Nurse (ICU)', 'City Hospital', 'Healthcare'),
        |  (3, 'Sales Associate - Retail', 'ShopMart', 'Retail'),
        |  (4, 'Accountant II', 'Finance Plus', 'Finance'),
        |  (5, 'Executive Chef', 'Fine Dining Inc', 'Hospitality'),
        |  (6, 'Marketing Coordinator/Manager', 'AdAgency', 'Marketing')""".stripMargin)
  }

  private def teardown(): Unit = {
    spark.sql("DROP VIEW IF EXISTS standardized_jobs")
    spark.sql("DROP TABLE IF EXISTS job_postings")
  }

  /** Standardized composite per README row id — pinned. */
  private val std = Map(
    1 -> "Backend Developer - Web Developers",
    2 -> "ICU Nurse - Registered Nurses",
    3 -> "Retail Sales Associate - Other Sales and Related Workers",
    4 -> "Accountant - Accountants and Auditors",
    5 -> "Executive Chef - Cooks, Restaurant",
    6 -> "Marketing Coordinator - Market Research Analysts and Marketing Specialists")

  test("example 1: basic scalar standardization (pinned)") {
    GraftFunctions.register(spark)
    def one(t: String): String =
      spark.sql(s"SELECT standardize_title('$t') AS s").collect()(0).getString(0)
    assert(one("Sr. Software Eng") == "Software Engineer - Software Developers")
    assert(one("RN - Emergency Room") == "RN - Registered Nurses")
    assert(one("Teacher - High School Math") ==
      "High School Teacher - Secondary School Teachers, Except Special and Career/Technical Education")
  }

  test("examples 2-6: bulk, aggregation, filtering, split_part, views (pinned)") {
    setup()
    try {
      // Example 2: bulk standardization over the table
      val ex2 = spark.sql(
        """SELECT id, original_title, standardize_title(original_title) AS standardized_title,
          |       industry, company
          |FROM job_postings ORDER BY id""".stripMargin).collect()
      assert(ex2.length == 6)
      ex2.foreach(r => assert(r.getString(2) == std(r.getInt(0)),
        s"row ${r.getInt(0)}: ${r.getString(2)}"))

      // Example 3: grouping + aggregation (all six standardize distinctly)
      val ex3 = spark.sql(
        """SELECT standardize_title(original_title) AS standard_title,
          |       COUNT(*) AS job_count, COUNT(DISTINCT industry) AS industries_count
          |FROM job_postings
          |GROUP BY standardize_title(original_title)
          |ORDER BY job_count DESC, standard_title""".stripMargin).collect()
      assert(ex3.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet ==
        std.values.map(s => (s, 1L, 1L)).toSet)

      // Example 4: IN-list of bare titles matches nothing (outputs are
      // composites) and no composite contains 'Engineer' for this data —
      // both published queries faithfully return empty.
      val ex4a = spark.sql(
        """SELECT original_title FROM job_postings
          |WHERE standardize_title(original_title) IN
          |  ('Registered Nurse', 'Licensed Practical Nurse', 'Nurse Practitioner')""".stripMargin)
      assert(ex4a.collect().isEmpty)
      val ex4b = spark.sql(
        """SELECT original_title FROM job_postings
          |WHERE standardize_title(original_title) LIKE '%Engineer%'""".stripMargin)
      assert(ex4b.collect().isEmpty)
      // ...and the LIKE shape does match when the pattern exists:
      val ex4c = spark.sql(
        """SELECT original_title FROM job_postings
          |WHERE standardize_title(original_title) LIKE '%Developer%'
          |ORDER BY original_title""".stripMargin).collect()
      assert(ex4c.map(_.getString(0)).toSeq == Seq("Sr Software Engineer - Backend"))

      // Example 5: split_part cracking of the composite
      val ex5 = spark.sql(
        """SELECT id,
          |  split_part(standardize_title(original_title), ' - ', 1) AS specific_title,
          |  split_part(standardize_title(original_title), ' - ', 2) AS bls_category
          |FROM job_postings ORDER BY id""".stripMargin).collect()
      ex5.foreach { r =>
        val parts = std(r.getInt(0)).split(" - ", 2)
        assert(r.getString(1) == parts(0) && r.getString(2) == parts(1))
      }
      // README's own example-5 row: 'Sr Software Engineer' (no '- Backend')
      val ex5b = spark.sql(
        "SELECT standardize_title('Sr Software Engineer') AS s").collect()(0).getString(0)
      assert(ex5b == "Software Engineer - Software Developers") // matches README verbatim

      // Example 6: view + filtered queries over it
      // TEMPORARY: a persistent Spark view may not reference a session-
      // registered function; temp view is the Spark-idiomatic equivalent
      spark.sql(
        """CREATE TEMPORARY VIEW standardized_jobs AS
          |SELECT id, original_title,
          |  standardize_title(original_title) AS standardized_title,
          |  split_part(standardize_title(original_title), ' - ', 1) AS specific_title,
          |  split_part(standardize_title(original_title), ' - ', 2) AS bls_category,
          |  industry, company
          |FROM job_postings""".stripMargin)
      val healthcare = spark.sql(
        "SELECT id, standardized_title FROM standardized_jobs WHERE industry = 'Healthcare'")
        .collect()
      assert(healthcare.toSeq == Seq(Row(2, std(2))))
      val byCat = spark.sql(
        "SELECT id FROM standardized_jobs WHERE bls_category = 'Web Developers'")
        .collect()
      assert(byCat.map(_.getInt(0)).toSeq == Seq(1))
    } finally teardown()
  }
}
