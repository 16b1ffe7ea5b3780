"""Antibody/channel name normalization — SURVEY.md §2.8 E1 + §2.4 J4.

Replicates the reference's two-step normalization as pure column
expressions (no UDF, stays in whole-stage codegen):

  * ``analyte_name``: ``get_analyte_name`` (bin/concatenate.py:63-71) —
    re.sub of the ``Anti-`` prefix and ``\\s+antibody``/``antibody``
    suffixes (re.sub replaces ALL occurrences, not anchored — preserved).
  * ``canonical_channel``: ``find_antibody_key``
    (bin/concatenate.py:26-42,74-81) — case-insensitive strip match of
    the name against the synonym dictionary's *values*, first matching
    key wins (dict iteration order), identity fallback.

Union correctness across datasets depends on running this *before* the
channel-axis union (SURVEY §1.4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Seed data from the reference's antibodies_dict (bin/concatenate.py:26-42):
# canonical key → synonym value(s). The keys themselves are NOT matched
# (find_antibody_key compares values only; identity fallback covers keys).
ANTIBODY_SYNONYMS: dict[str, list[str]] = {
    "BCL-2": ["BCL2"],
    "Collagen IV": ["CollIV", "CollagenIV", "collagen IV", "COLIV"],
    "Cytokeratin": ["cytokeratin"],
    "eCAD": ["E-CAD", "ECAD"],
    "HLA-DR": ["HLADR"],
    "Hoechst1": ["HOECHST1"],
    "PanCK": ["panCK"],
    "Podoplanin": ["Podoplan", "podoplanin", "PDPN"],
    "Synaptophysin": ["Synapt", "Synapto"],
    "aDefensin 5": ["aDef5", "aDefensin5"],
    "MUC-1/EMA": ["MUC1"],
    "NKG2D (CD314)": ["NKG2D", "NKG2G"],
    "a-SMA": ["SMActin", "aSMA", "SMA"],
    "MUC-2": ["MUC2"],
    "Foxp3": ["FoxP3"],
}


def _synonym_pairs() -> list[tuple[str, str]]:
    """(synonym_lower → canonical), first key wins on collisions —
    preserving find_antibody_key's first-match precedence."""
    seen: dict[str, str] = {}
    for canonical, synonyms in ANTIBODY_SYNONYMS.items():
        for syn in synonyms:
            key = syn.strip().lower()
            if key not in seen:
                seen[key] = canonical
    return list(seen.items())


def analyte_name(col: Column | str) -> Column:
    """Strip Anti- prefix and antibody suffixes (all occurrences)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, "Anti-", "")
    c = F.regexp_replace(c, r"\s+antibody", "")
    return F.regexp_replace(c, "antibody", "")


def canonical_channel(col: Column | str) -> Column:
    """Synonym-map lookup with identity fallback, as a create_map literal
    (≤ ~30 entries: an in-expression broadcast, zero shuffle)."""
    c = F.col(col) if isinstance(col, str) else col
    pairs = _synonym_pairs()
    lookup = F.create_map(*[F.lit(x) for kv in pairs for x in kv])
    return F.coalesce(lookup[F.lower(F.trim(c))], c)


def canonical_channel_py(name: str) -> str:
    """Driver-side twin of ``canonical_channel`` for CSV *header* names
    (var_names mapping, bin/concatenate.py:246) — headers are plan-time
    metadata, so this runs on a handful of strings, never on rows."""
    lookup = dict(_synonym_pairs())
    return lookup.get(name.strip().lower(), name)


def standardized_antibody_name(col: Column | str) -> Column:
    """Full standardization applied to antibodies.tsv names
    (standardize_antb_df, bin/concatenate.py:186-192): strip, then map."""
    return canonical_channel(analyte_name(col))
