package graft.ops

/** Internal-column naming for operators that add temporary columns
  * (salt, cell, as-of scratch): probe `base`, `base_1`, `base_2`, … until
  * the name collides with nothing the caller brought. One implementation
  * instead of a per-operator copy, so a future resolution tweak (e.g.
  * case-insensitive catalogs) lands everywhere at once.
  */
private[graft] object ColNames {
  def fresh(taken: Set[String], base: String): String =
    Iterator.from(0)
      .map(i => if (i == 0) base else s"${base}_$i")
      .find(!taken.contains(_)).get
}
