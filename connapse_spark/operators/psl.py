"""Public-suffix list (PSL) machinery for eTLD+1 / registered-domain
grouping (publicsuffix.org — the list Mozilla/Chrome/libpsl use).

Implements the FULL PSL algorithm, not just two-level lookups:

* normal rules (``co.uk``) — the suffix is the rule itself;
* wildcard rules (``*.ck``) — any single label plus the base is a suffix;
* exception rules (``!www.ck``) — carve-outs that beat wildcards: the
  suffix is the rule minus its leftmost label;
* precedence: exceptions first, then the longest matching rule, then the
  implicit default rule ``*`` (every bare TLD is a suffix).

The registered domain (eTLD+1) is the public suffix plus one label; a
host that IS a public suffix passes through unchanged.

The rule set is DATA: ``PSL_SUBSET`` below is a curated ~190-rule
ICANN-section subset covering the high-traffic ccTLD registries (the
container has no network access to fetch the 9k-rule upstream list);
``load_psl_file`` parses the real ``public_suffix_list.dat`` format, so
a deployment swaps in the full list with one call — every expression
below is built from the parsed structure and is unchanged by the swap.

Expression shape: the rule tables compile to literal ``isin`` sets inside
whole-stage codegen (a few hundred entries is nothing to Catalyst). With
the full 9k-rule list the same structure works; if compile size ever
mattered, the identical per-length membership tests can run as a
broadcast join against a rules table — same one shuffle-free plan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Curated ICANN-section subset: the multi-level registries a web corpus
# actually hits, plus the canonical wildcard/exception examples. Format
# is exactly the upstream file's (one rule per line).
PSL_SUBSET = [
    # United Kingdom
    "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk", "sch.uk",
    "ac.uk", "gov.uk", "nhs.uk", "police.uk",
    # Australia
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    # Japan (incl. three-level prefecture examples)
    "co.jp", "ne.jp", "or.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp",
    "gr.jp", "lg.jp",
    # Brazil
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "art.br", "blog.br",
    "eco.br", "app.br",
    # India
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in", "ac.in",
    "edu.in", "gov.in", "res.in",
    # China
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    # South Korea
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr", "pe.kr",
    # South Africa
    "co.za", "net.za", "org.za", "gov.za", "ac.za", "web.za",
    # New Zealand
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "geek.nz", "gen.nz",
    "kiwi.nz", "maori.nz", "school.nz",
    # Mexico / Argentina / Chile / Colombia / Peru / Venezuela
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
    "gob.cl", "gov.cl",
    "com.co", "net.co", "org.co", "gov.co", "edu.co",
    "com.pe", "net.pe", "org.pe", "gob.pe", "edu.pe",
    "com.ve", "net.ve", "org.ve", "gob.ve", "edu.ve",
    # Turkey
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "bel.tr", "web.tr",
    # Singapore / Hong Kong / Taiwan
    "com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg", "per.sg",
    "com.hk", "net.hk", "org.hk", "gov.hk", "edu.hk", "idv.hk",
    "com.tw", "net.tw", "org.tw", "gov.tw", "edu.tw", "idv.tw",
    # Israel
    "co.il", "net.il", "org.il", "gov.il", "ac.il", "muni.il",
    # Russia / Ukraine
    "com.ru", "net.ru", "org.ru", "msk.ru", "spb.ru",
    "com.ua", "net.ua", "org.ua", "gov.ua", "edu.ua", "in.ua",
    # Thailand / Indonesia / Malaysia / Philippines / Vietnam
    "co.th", "net.th", "or.th", "go.th", "ac.th", "in.th",
    "co.id", "net.id", "or.id", "go.id", "ac.id", "web.id", "my.id",
    "com.my", "net.my", "org.my", "gov.my", "edu.my",
    "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph",
    "com.vn", "net.vn", "org.vn", "gov.vn", "edu.vn",
    # Poland
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "waw.pl",
    # Egypt / Nigeria / Kenya / Saudi Arabia / UAE / Pakistan / Bangladesh
    "com.eg", "net.eg", "org.eg", "gov.eg", "edu.eg",
    "com.ng", "net.ng", "org.ng", "gov.ng", "edu.ng",
    "co.ke", "or.ke", "go.ke", "ac.ke",
    "com.sa", "net.sa", "org.sa", "gov.sa", "edu.sa",
    "co.ae", "net.ae", "org.ae", "gov.ae", "ac.ae",
    "com.pk", "net.pk", "org.pk", "gov.pk", "edu.pk",
    # three-level US locality examples (k12 school districts)
    "k12.ma.us", "k12.ca.us", "cc.ca.us", "pvt.k12.ma.us",
    # wildcard + exception rules (the PSL's own canonical examples)
    "*.ck", "!www.ck",
    "*.bd",
    "*.kh",
    "*.er",
    "*.np",
]


def parse_rules(lines: list[str]) -> dict[str, dict[int, list[str]]]:
    """Rule strings → per-kind, per-label-count membership tables:
    ``{"normal": {2: [...], 3: [...]}, "wildcard_base": {1: [...]},
    "exception": {2: [...]}}`` — the shape the expressions index by."""
    out: dict[str, dict[int, list[str]]] = {
        "normal": {}, "wildcard_base": {}, "exception": {},
    }
    for raw in lines:
        rule = raw.strip().lower()
        if not rule or rule.startswith("//"):
            continue
        if rule.startswith("!"):
            body = rule[1:]
            out["exception"].setdefault(body.count(".") + 1, []).append(body)
        elif rule.startswith("*."):
            base = rule[2:]
            out["wildcard_base"].setdefault(base.count(".") + 1, []).append(base)
        else:
            out["normal"].setdefault(rule.count(".") + 1, []).append(rule)
    return out


def load_psl_file(path: str) -> dict[str, dict[int, list[str]]]:
    """Parse the real ``public_suffix_list.dat`` (comment lines ``//``,
    blank separators; both ICANN and PRIVATE sections are rules). Drop-in
    replacement for the embedded subset:
    ``registered_domain_expr(host, rules=load_psl_file(p))``."""
    with open(path, encoding="utf-8") as f:
        return parse_rules(f.read().splitlines())


_DEFAULT_RULES = parse_rules(PSL_SUBSET)


def _last_labels(labels: Column, k: int) -> Column:
    return F.array_join(F.slice(labels, -k, k), ".")


def suffix_len_expr(host: Column, rules: dict | None = None) -> Column:
    """Label count of ``host``'s public suffix under the PSL algorithm.
    Branch order IS the precedence: exceptions, then effective rule
    length descending, then the default rule (1)."""
    rules = rules or _DEFAULT_RULES
    labels = F.split(host, r"\.")
    n = F.size(labels)

    # (priority-ordered) list of (condition, ps_len) branches
    branches: list[tuple[Column, int]] = []
    for L in sorted(rules["exception"], reverse=True):
        branches.append(
            ((n >= L) & _last_labels(labels, L).isin(rules["exception"][L]), L - 1)
        )
    eff_lens = set(rules["normal"]) | {b + 1 for b in rules["wildcard_base"]}
    for L in sorted(eff_lens, reverse=True):
        cond = F.lit(False)
        if L in rules["normal"]:
            cond = cond | ((n >= L) & _last_labels(labels, L).isin(rules["normal"][L]))
        if L - 1 in rules["wildcard_base"]:
            cond = cond | (
                (n >= L) & _last_labels(labels, L - 1).isin(rules["wildcard_base"][L - 1])
            )
        branches.append((cond, L))

    expr = F.lit(1)  # default rule: '*' — every bare TLD is a suffix
    for cond, L in reversed(branches):
        expr = F.when(cond, F.lit(L)).otherwise(expr)
    return expr


def registered_domain_psl_expr(host: Column, rules: dict | None = None) -> Column:
    """eTLD+1: the public suffix plus one label; a host that IS a public
    suffix (or has fewer labels than one) passes through."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    ps = suffix_len_expr(host, rules)
    reg_len = ps + F.lit(1)
    return F.when(
        n > ps, F.array_join(F.slice(labels, n - ps, reg_len), ".")
    ).otherwise(host)


# ---------------------------------------------------------------------------
# DuckDB mirrors (same branch order, same membership tables)
# ---------------------------------------------------------------------------


def _sql_last_labels(labels: str, k: int) -> str:
    return f"array_to_string({labels}[-{k}:], '.')"


def sql_suffix_len(host: str, rules: dict | None = None) -> str:
    rules = rules or _DEFAULT_RULES
    labels = f"string_split({host}, '.')"
    n = f"len({labels})"
    whens: list[str] = []
    for L in sorted(rules["exception"], reverse=True):
        vals = ", ".join(f"'{v}'" for v in rules["exception"][L])
        whens.append(
            f"WHEN {n} >= {L} AND {_sql_last_labels(labels, L)} IN ({vals}) THEN {L - 1}"
        )
    eff_lens = set(rules["normal"]) | {b + 1 for b in rules["wildcard_base"]}
    for L in sorted(eff_lens, reverse=True):
        conds = []
        if L in rules["normal"]:
            vals = ", ".join(f"'{v}'" for v in rules["normal"][L])
            conds.append(f"{_sql_last_labels(labels, L)} IN ({vals})")
        if L - 1 in rules["wildcard_base"]:
            vals = ", ".join(f"'{v}'" for v in rules["wildcard_base"][L - 1])
            conds.append(f"{_sql_last_labels(labels, L - 1)} IN ({vals})")
        whens.append(f"WHEN {n} >= {L} AND ({' OR '.join(conds)}) THEN {L}")
    return "(CASE " + " ".join(whens) + " ELSE 1 END)"


def sql_registered_domain_psl(host: str, rules: dict | None = None) -> str:
    labels = f"string_split({host}, '.')"
    n = f"len({labels})"
    ps = sql_suffix_len(host, rules)
    return (
        f"(CASE WHEN {n} > {ps} "
        f"THEN array_to_string({labels}[{n} - {ps}:], '.') "
        f"ELSE {host} END)"
    )
