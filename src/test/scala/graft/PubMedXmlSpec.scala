package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.PubMedXml

/** F19 from_xml parity with the reference's ElementTree walk
  * (pubmed_enrichment.py:185-233), FIXTURES.md B4 sample shape. */
class PubMedXmlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sample =
    """<PubmedArticleSet>
      |  <PubmedArticle>
      |    <MedlineCitation>
      |      <Article>
      |        <ArticleTitle>A Study of Examplinib</ArticleTitle>
      |        <Journal>
      |          <Title>Journal of Examples</Title>
      |          <JournalIssue><PubDate><Year>2023</Year></PubDate></JournalIssue>
      |        </Journal>
      |        <AuthorList>
      |          <Author><LastName>Smith</LastName><ForeName>Jane</ForeName></Author>
      |          <Author><LastName>Doe</LastName></Author>
      |        </AuthorList>
      |      </Article>
      |    </MedlineCitation>
      |    <PubmedData>
      |      <ArticleIdList>
      |        <ArticleId IdType="pubmed">12345</ArticleId>
      |        <ArticleId IdType="doi">10.1234/jex.2023.001</ArticleId>
      |      </ArticleIdList>
      |    </PubmedData>
      |  </PubmedArticle>
      |</PubmedArticleSet>""".stripMargin

  test("parses title, doi, journal, year, authors") {
    val df = Seq(sample).toDF("xml")
    val r = PubMedXml.parseToColumns(df, "xml")
      .select("title", "doi", "journal", "year", "authors").collect()(0)
    assert(r.getString(0) == "A Study of Examplinib")
    assert(r.getString(1) == "10.1234/jex.2023.001")
    assert(r.getString(2) == "Journal of Examples")
    assert(r.getString(3) == "2023")
    assert(r.getSeq[String](4) == Seq("Smith, Jane", "Doe"))
  }

  test("missing fields fall back like the reference (Unknown / null / [])") {
    val bare = "<PubmedArticleSet><PubmedArticle><MedlineCitation><Article>" +
      "</Article></MedlineCitation></PubmedArticle></PubmedArticleSet>"
    val r = PubMedXml.parseToColumns(Seq(bare).toDF("xml"), "xml")
      .select("title", "doi", "journal", "year", "authors").collect()(0)
    assert(r.getString(0) == "Unknown")
    assert(r.isNullAt(1))
    assert(r.getString(2) == "Unknown")
    assert(r.getString(3) == "Unknown")
    assert(r.getSeq[String](4).isEmpty)
  }
}
