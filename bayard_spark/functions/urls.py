"""URL canonicalization and domain-level filtering for web-corpus
pipelines (the CCNet / RefinedWeb "URL dedup + domain blocklist" stage).

A 100-TB crawl's first cheap wins are URL-keyed: exact URL dedup needs a
canonical form (tracking params, fragments, case and default ports make
spurious distinct keys), and domain blocklists need the REGISTERED
domain (site owner), not the raw host (one spam site = millions of
subdomain hosts). Everything here is pure JVM expression chains —
regexp_extract / array ops, zero shuffle for the normalizer — and every
rule is kept replayable in ANSI-ish SQL so the driver oracle bit-compares
it.

Canonicalization rules (deterministic, documented, applied in order):
  1. scheme lowercased; userinfo (user:pass@) dropped
  2. host lowercased; one leading "www." stripped; default ports
     (http:80, https:443) stripped, any other explicit port kept
  3. fragment dropped
  4. query: split on '&', drop empties and tracking params (utm_*,
     fbclid, gclid, msclkid, mc_eid, igshid, ref), sort the survivors
     lexicographically (param order never distinguishes resources),
     rejoin; an emptied query drops its '?'
  5. path: trailing '/' stripped; empty path becomes '/'

Registered domain: last two host labels, or last three when the
two-label tail is a known multi-part public suffix (the high-traffic
subset below — a full public-suffix list is a data file swap, not a
code change). IP-literal hosts are their own registered domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# high-traffic multi-part public suffixes (public-suffix-list subset)
MULTIPART_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "co.nz", "net.nz", "org.nz",
    "com.br", "net.br", "org.br",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "com.ar", "com.tr", "com.tw", "com.sg", "com.hk",
    "co.in", "co.kr", "co.za", "co.id", "co.th",
]

TRACKING_PARAMS = ["fbclid", "gclid", "msclkid", "mc_eid", "igshid", "ref"]

_URL_RE = (
    r"^([A-Za-z][A-Za-z0-9+.-]*)://"  # 1 scheme
    r"(?:[^/?#@]*@)?"                 # userinfo (dropped)
    r"([^/?#:]*)(?::([0-9]+))?"       # 2 host, 3 port
    r"([^?#]*)"                       # 4 path
    r"(?:\?([^#]*))?"                 # 5 query
    r"(?:#.*)?$"                      # fragment (dropped)
)
_IP_RE = r"^(?:[0-9]{1,3}\.){3}[0-9]{1,3}$"


def _is_tracking(p):
    key = F.split(p, "=")[0]
    cond = key.startswith("utm_")
    for t in TRACKING_PARAMS:
        cond = cond | (key == t)
    return cond


def url_normalize(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, url_norm, host, registered_domain) per input row.

    Unparseable URLs (no scheme://host) emit NULL url_norm/host/domain —
    typed absence, never a half-normalized string. Pure narrow
    expressions: no shuffle, whole-stage codegen end to end.
    """
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, _URL_RE, 1))
    host0 = F.lower(F.regexp_extract(u, _URL_RE, 2))
    host = F.regexp_replace(host0, r"^www\.", "")
    port = F.regexp_extract(u, _URL_RE, 3)
    path0 = F.regexp_extract(u, _URL_RE, 4)
    query0 = F.regexp_extract(u, _URL_RE, 5)

    keep_port = F.when(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.when(path0 == "", F.lit("/")).otherwise(
        F.when(
            (F.length(path0) > 1) & path0.endswith("/"),
            path0.substr(F.lit(1), F.length(path0) - 1),
        ).otherwise(path0)
    )
    params = F.array_sort(
        F.filter(
            F.split(query0, "&"),
            lambda p: (p != "") & ~_is_tracking(p),
        )
    )
    query = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(params, "&")),
    ).otherwise(F.lit(""))

    labels = F.split(host, r"\.")
    nl = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    last3 = F.concat_ws(
        ".",
        F.element_at(labels, -3),
        F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    is_multi = F.lit(False)
    for s in MULTIPART_SUFFIXES:
        is_multi = is_multi | (last2 == s)
    reg_dom = (
        F.when(host.rlike(_IP_RE), host)
        .when((nl >= 3) & is_multi, last3)
        .when(nl >= 2, last2)
        .otherwise(host)
    )

    # IPv6 bracket literals ([::1]) would mis-split on ':' — emit typed
    # NULLs (same contract as unparseable URLs) rather than a half-parsed
    # host; bracket hosts are vanishingly rare in crawl URL sets
    ok = (scheme != "") & (host != "") & ~host.contains("[")
    url_norm = F.concat(F.lit(""), scheme, F.lit("://"), host, keep_port,
                        path, query)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.when(ok, url_norm).alias("url_norm"),
        F.when(ok, host).alias("host"),
        F.when(ok, reg_dom).alias("registered_domain"),
    )


DOMAIN_BLOCKLIST_BROADCAST_MAX = 10_000_000


def domain_filter(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    blocklist_count: int | None = None,
) -> DataFrame:
    """Tag every row with is_blocked = its registered domain appears in
    `blocklist` (one column: `domain`). A tag, not a drop, so callers can
    audit what a blocklist removes before committing to it.

    The blocklist joins on registered_domain with a broadcast hint while
    it plausibly fits (<= DOMAIN_BLOCKLIST_BROADCAST_MAX entries —
    real-world blocklists are ~1M domains); above that it falls back to
    a plain shuffle join. Pass blocklist_count to skip the measuring
    count() job.
    """
    n = blocklist_count if blocklist_count is not None else blocklist.count()
    bl = blocklist.select(F.col("domain").alias("registered_domain")).distinct()
    if n <= DOMAIN_BLOCKLIST_BROADCAST_MAX:
        bl = F.broadcast(bl)
    norm = url_normalize(df, url_col=url_col, id_col=id_col)
    hit = bl.withColumn("is_blocked", F.lit(True))
    return norm.join(hit, "registered_domain", "left").select(
        "doc_id",
        "url_norm",
        "host",
        "registered_domain",
        F.coalesce("is_blocked", F.lit(False)).alias("is_blocked"),
    )
