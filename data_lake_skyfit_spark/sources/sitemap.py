"""sitemap.xml URL extraction — the crawl-frontier seeding step that
pairs with sources/robots.py (may-we-fetch) and llm/text.normalize_url
(frontier dedup key).

Deliberately regex-tier, like html_to_text: `<loc>` elements are
extracted with one lazy-quantifier pattern shared VERBATIM between
Java regex and RE2 (no lookarounds, no backreferences), so the battery
oracle replays the extraction exactly. A namespace-aware XML parser is
out of scope for the same reason the HTML tier skips a DOM: the
pattern covers well-formed sitemaps and sitemap-index files (both
spell URLs as `<loc>…</loc>`), and malformed XML degrades to fewer
matches, never to a task failure. Zero-shuffle codegen map.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["SITEMAP_LOC_RE", "sitemap_locs"]

#: One capture group: the URL between <loc> tags, surrounding
#: whitespace left to the trim step (RE2 and Java agree on all of it).
SITEMAP_LOC_RE = r"<loc>\s*([^<]*?)\s*</loc>"


def sitemap_locs(xml: Column | str) -> Column:
    """sitemap/sitemap-index XML → array of contained URLs (trimmed,
    empties dropped, document order preserved)."""
    col = F.col(xml) if isinstance(xml, str) else xml
    locs = F.regexp_extract_all(col, F.lit(SITEMAP_LOC_RE), 1)
    return F.filter(F.transform(locs, lambda s: F.trim(s)), lambda s: s != "")
