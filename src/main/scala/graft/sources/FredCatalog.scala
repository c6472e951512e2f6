package graft.sources

/** The reference's FRED macro catalog: 22 series across 8 indicator
  * categories (S-6; reference `src/macro.py:49-87` `FRED_SERIES` and
  * `src/macro.py:248-257` `category_series`). Keys are the friendly
  * names the reference exposes; values are the public FRED series ids.
  */
object FredCatalog {

  val series: Map[String, String] = Map(
    // Interest Rates
    "fed_funds_rate" -> "FEDFUNDS",
    "treasury_10y" -> "GS10",
    "treasury_2y" -> "GS2",
    "treasury_3m" -> "GS3M",
    // Inflation
    "cpi_all" -> "CPIAUCSL",
    "cpi_core" -> "CPILFESL",
    "pce_inflation" -> "PCEPI",
    "pce_core" -> "PCEPILFE",
    // Economic Growth
    "gdp" -> "GDP",
    "gdp_real" -> "GDPC1",
    "gdp_deflator" -> "GDPDEF",
    // Employment
    "unemployment_rate" -> "UNRATE",
    "nonfarm_payrolls" -> "PAYEMS",
    "labor_force_participation" -> "CIVPART",
    // Money Supply & Credit
    "money_supply_m1" -> "M1SL",
    "money_supply_m2" -> "M2SL",
    // Market Indicators
    "vix" -> "VIXCLS",
    "dollar_index" -> "DTWEXBGS",
    // Commodities
    "oil_price" -> "DCOILWTICO",
    "gold_price" -> "GOLDAMGBD228NLBM",
    // Housing
    "housing_starts" -> "HOUST",
    "case_shiller" -> "CSUSHPISA")

  val categories: Map[String, Seq[String]] = Map(
    "rates" -> Seq("fed_funds_rate", "treasury_10y", "treasury_2y", "treasury_3m"),
    "inflation" -> Seq("cpi_all", "cpi_core", "pce_inflation", "pce_core"),
    "growth" -> Seq("gdp", "gdp_real", "gdp_deflator"),
    "employment" -> Seq("unemployment_rate", "nonfarm_payrolls", "labor_force_participation"),
    "money" -> Seq("money_supply_m1", "money_supply_m2"),
    "market" -> Seq("vix", "dollar_index"),
    "commodities" -> Seq("oil_price", "gold_price"),
    "housing" -> Seq("housing_starts", "case_shiller"))

  /** Friendly names → FRED ids for the requested categories; empty → all
    * (reference `src/macro.py:258-267`).
    */
  def resolve(requested: Seq[String]): Seq[String] =
    SourceOps.resolveCategories(requested, categories).flatMap(series.get)

  /** (series_id, series_name, category) rows for enrichment joins —
    * the reference carries `series_name` in the tidy frame
    * (`src/macro.py:148-152`) and `category` in the warehouse DDL
    * (`src/database.py:73-86`). Sorted for deterministic plans.
    */
  val catalogRows: Seq[(String, String, String)] =
    categories.toSeq.flatMap { case (cat, names) =>
      names.flatMap(n => series.get(n).map(id => (id, n, cat)))
    }.sortBy(_._1)
}
