"""Record-linkage operators: fuzzy matching with guaranteed-recall
blocking.

The naive fuzzy self-join is O(n²) string comparisons; the 100 TB shape
is FastSS-style deletion-neighborhood blocking: every name emits its
full string plus each single-deletion variant as candidate keys, and two
strings within edit distance 1 ALWAYS share a key (equal -> full string;
substitution at i -> deletion at i; insert/delete -> the shorter string
itself). Candidates are an equi-join on the key — O(n·len) rows, never a
cartesian — and the cheap exact `levenshtein` verify runs only on
candidates. Both the variant generation and the verify are built-in
Catalyst expressions with exact DuckDB equivalents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: full string + every single-deletion variant of column `name`
_VARIANTS = (
    "array_union(array(name), transform(sequence(0, length(name) - 1), "
    "i -> concat(substr(name, 1, i), substr(name, i + 2))))"
)


def fuzzy_pairs(names: DataFrame, max_edit: int = 1) -> DataFrame:
    """Near-duplicate pairs within a name set at edit distance <=
    ``max_edit`` (must be 1 — the deletion-neighborhood guarantee is for
    one edit; chain/iterate for larger radii). ``names`` needs one
    ``name`` column, distinct. Returns: name_a, name_b (name_a <
    name_b), dist."""
    if max_edit != 1:
        raise ValueError("deletion-neighborhood blocking guarantees radius 1")
    keyed = names.select(
        "name", F.explode(F.expr(_VARIANTS)).alias("_k")
    )
    right = keyed.select(F.col("name").alias("name_b"), F.col("_k").alias("_kb"))
    return (
        keyed.join(
            right,
            (F.col("_k") == F.col("_kb")) & (F.col("name") < F.col("name_b")),
        )
        .select(F.col("name").alias("name_a"), "name_b")
        .distinct()
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= max_edit)
    )
