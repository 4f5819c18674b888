package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Citation/authors/link formatting from the PubMed-enrichment phase
  * (SURVEY.md §2.8 F15–F17). Pure column compositions — the live-API
  * lookup itself is modeled as a broadcast dimension join (J2), see
  * [[graft.pipeline.PdfPipeline]].
  */
object Enrich {

  /** F15 — author display form from an array column:
    * `[]` → "Unknown"; 1 → as-is; ≤3 → "a, b, & c"; else "first et al.".
    * Ref: pdf_extraction/pubmed_enrichment.py:235-244. */
  def formatAuthors(authors: Column): Column = {
    val n = size(authors)
    when(authors.isNull || n === 0, lit("Unknown"))
      .when(n === 1, element_at(authors, 1))
      .when(n <= 3,
        concat(
          concat_ws(", ", slice(authors, lit(1), n - 1)),
          lit(", & "),
          element_at(authors, -1)))
      .otherwise(concat(element_at(authors, 1), lit(" et al.")))
  }

  /** F16 — citation string:
    * `{authors}. ({year}). {title}. {journal}[. https://doi.org/{doi}]`.
    * Ref: pdf_extraction/pubmed_enrichment.py:216-219. */
  def buildCitation(authors: Column, year: Column, title: Column,
                    journal: Column, doi: Column): Column =
    concat(
      authors, lit(". ("), year, lit("). "), title, lit(". "), journal,
      when(doi.isNotNull && length(trim(doi)) > 0,
        concat(lit(". https://doi.org/"), doi)).otherwise(lit("")))

  /** F17 — canonical link: DOI link if present, else PubMed page.
    * Ref: pdf_extraction/pubmed_enrichment.py:222,430. */
  def buildLink(doi: Column, pmid: Column): Column =
    when(doi.isNotNull && length(trim(doi)) > 0,
      concat(lit("https://doi.org/"), doi))
      .otherwise(concat(lit("https://pubmed.ncbi.nlm.nih.gov/"), pmid))
}
