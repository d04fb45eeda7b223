package graft.spec

import java.time.LocalDate
import java.time.format.DateTimeFormatter

/** `{{nDaysAgo N}}` macro resolver (`/root/reference/data_extract.py:109-126`).
  *
  * The reference parses the macro with a regex and returns
  * `today − N days` formatted `YYYY-MM-DD`; any non-macro input logs an
  * error and yields `None` (the IndexError on a failed `findall` is
  * swallowed — `data_extract.py:127-135`). We model that net behavior as
  * `Option[String]`, with `today` injected for deterministic tests
  * (SURVEY.md §7.5.4 — the reference uses wall-clock `date.today()`).
  */
object DateMacro {
  private val Pattern = """\{\{\s*nDaysAgo\s+(\d+)\s*\}\}""".r
  private val Fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd")

  def nDaysAgo(input: String, today: LocalDate): Option[String] =
    input match {
      case Pattern(n) => Some(today.minusDays(n.toLong).format(Fmt))
      case _          => None
    }

  /** Resolve a date field that may be a macro or already a literal
    * `YYYY-MM-DD` string. Literal dates pass through; bad input → None
    * (config skipped upstream, E1/E2 semantics).
    */
  def resolve(input: String, today: LocalDate): Option[String] =
    if (input.matches("""\d{4}-\d{2}-\d{2}""")) Some(input)
    else nDaysAgo(input, today)
}
