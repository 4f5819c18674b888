package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** F19 — PubMed efetch XML parsing via Spark 4's native `from_xml`
  * (reference hand-walks ElementTree: pdf_extraction/pubmed_enrichment.py:185-233).
  * The declarative schema covers exactly the fields the reference reads:
  * ArticleTitle, ArticleId[@IdType='doi'], Journal/Title, PubDate/Year,
  * Author LastName/ForeName; defaults ("Unknown"/null) mirror the
  * reference's fallbacks.
  */
object PubMedXml {

  /** Schema for a <PubmedArticleSet> efetch response, built inside-out for
    * auditability against the reference's XPath reads. */
  val schema: StructType = {
    val pubDate = StructType(Seq(StructField("Year", StringType)))
    val journalIssue = StructType(Seq(StructField("PubDate", pubDate)))
    val journal = StructType(Seq(
      StructField("Title", StringType),
      StructField("JournalIssue", journalIssue)))
    val author = StructType(Seq(
      StructField("LastName", StringType),
      StructField("ForeName", StringType)))
    val authorList = StructType(Seq(StructField("Author", ArrayType(author))))
    val article = StructType(Seq(
      StructField("ArticleTitle", StringType),
      StructField("Journal", journal),
      StructField("AuthorList", authorList)))
    val medline = StructType(Seq(StructField("Article", article)))
    val articleId = StructType(Seq(
      StructField("_IdType", StringType),
      StructField("_VALUE", StringType)))
    val idList = StructType(Seq(StructField("ArticleId", ArrayType(articleId))))
    val pubmedData = StructType(Seq(StructField("ArticleIdList", idList)))
    val pubmedArticle = StructType(Seq(
      StructField("MedlineCitation", medline),
      StructField("PubmedData", pubmedData)))
    StructType(Seq(StructField("PubmedArticle", pubmedArticle)))
  }

  /** Parse an XML string column into the typed article struct. */
  def parsed(xml: Column): Column = from_xml(xml, schema)

  /** Project the parsed struct to the reference's PubMedResult fields:
    * (title, doi, journal, year, authors array of "Last, First"). */
  def fields(p: Column): Seq[Column] = {
    val art = p.getField("PubmedArticle")
    val article = art.getField("MedlineCitation").getField("Article")
    val ids = art.getField("PubmedData").getField("ArticleIdList").getField("ArticleId")
    val doi = element_at(filter(ids, id => id.getField("_IdType") === "doi"), 1)
      .getField("_VALUE")
    val authorsRaw = article.getField("AuthorList").getField("Author")
    // null AuthorList propagates through transform/filter; coalesce at the end
    val authors = transform(authorsRaw,
      a => when(a.getField("ForeName").isNotNull,
        concat_ws(", ", a.getField("LastName"), a.getField("ForeName")))
        .otherwise(a.getField("LastName")))
    Seq(
      coalesce(article.getField("ArticleTitle"), lit("Unknown")).as("title"),
      doi.as("doi"),
      coalesce(article.getField("Journal").getField("Title"), lit("Unknown")).as("journal"),
      coalesce(article.getField("Journal").getField("JournalIssue")
        .getField("PubDate").getField("Year"), lit("Unknown")).as("year"),
      coalesce(filter(authors, a => a.isNotNull),
        array().cast("array<string>")).as("authors"))
  }

  /** One-shot: xml string column → flat enrichment columns. */
  def parseToColumns(df: DataFrame, xmlCol: String): DataFrame = {
    val p = parsed(col(xmlCol))
    df.withColumn("_p", p).select(col("*") +: fields(col("_p")): _*).drop("_p")
  }
}
