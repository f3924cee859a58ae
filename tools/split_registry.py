#!/usr/bin/env python3
"""One-shot refactor: split SparkEntry's paired (queries, oracleSql)
maps into per-package QueryPack objects with entries side by side.

Parses the current SparkEntry.scala, joins the two maps by name
(failing loudly on any mismatch), buckets entries by implementing
package, and emits one <Pkg>Pack.scala per bucket plus the new
SparkEntry body. Comments above each entry travel with it.
"""
import re, sys, collections

SRC = "src/main/scala/graft/SparkEntry.scala"
lines = open(SRC).read().splitlines()

# ---------------------------------------------------------- parse maps
def parse_map(start_pat):
    """Returns ordered [(name, expr, comments)]; expr excludes the
    trailing comma. Handles entries wrapped over multiple lines via
    paren balancing."""
    out = []
    i = next(k for k, l in enumerate(lines) if re.search(start_pat, l)) + 1
    comments = []
    while i < len(lines):
        l = lines[i]
        if re.match(r"^  \)\s*$", l):
            break
        if re.match(r"^\s*//", l):
            comments.append(l.strip())
            i += 1
            continue
        m = re.match(r'^\s*"(q[^"]+)"\s*->\s*(.*)$', l)
        if not m:
            sys.exit(f"unparsed line {i+1}: {l!r}")
        name, expr = m.group(1), m.group(2)
        while expr.count("(") != expr.count(")") or not expr.rstrip().endswith(","):
            i += 1
            expr += " " + lines[i].strip()
        expr = expr.rstrip().rstrip(",").strip()
        out.append((name, expr, comments))
        comments = []
        i += 1
    return out

queries = parse_map(r"def queries: Map")
oracles = parse_map(r"def oracleSql: Map")
qmap = {n: (e, c) for n, e, c in queries}
omap = {n: e for n, e, c in oracles}
assert len(qmap) == len(queries) and len(omap) == len(oracles), "dup names"
assert set(qmap) == set(omap), set(qmap) ^ set(omap)
print(f"parsed {len(queries)} queries, {len(oracles)} oracles")

# ------------------------------------------------------- pack bucketing
RULES = [
    (r"RelationalQueries", "ops", "RelationalPack"),
    (r"\bMLQueries|graft\.ml\.", "ml", "MlPack"),
    (r"\bDedupQueries|graft\.dedup\.", "dedup", "DedupPack"),
    (r"SimilarityQueries|graft\.sim\.", "sim", "SimPack"),
    (r"TextQueries|\bScrub\b|graft\.text\.", "text", "TextPack"),
    (r"graft\.multimodal\.", "multimodal", "MultimodalPack"),
    (r"graft\.streaming\.", "streaming", "StreamingPack"),
    (r"graft\.fraud\.", "fraud", "FraudPack"),
    (r"graft\.ops\.|TopKAggregator", "ops", "OpsPack"),
]

def bucket(qexpr, oexpr):
    for pat, pkg, pack in RULES:
        if re.search(pat, qexpr):
            return pkg, pack
    for pat, pkg, pack in RULES:
        if re.search(pat, oexpr):
            return pkg, pack
    return "ops", "OpsPack"

packs = collections.OrderedDict()
for name, qexpr, comments in queries:
    oexpr = omap[name]
    pkg, pack = bucket(qexpr, oexpr)
    packs.setdefault((pkg, pack), []).append((name, qexpr, oexpr, comments))

for (pkg, pack), es in packs.items():
    print(f"{pack:16s} ({pkg}): {len(es)}")

# --------------------------------------------------------------- emit
# rewrite unqualified refs so pack files need no imports beyond their
# own package: SparkEntry imported these names unqualified.
QUALIFY = {
    "DedupQueries": "graft.dedup.DedupQueries",
    "MLQueries": "graft.ml.MLQueries",
    "RelationalQueries": "graft.ops.RelationalQueries",
    "SimilarityQueries": "graft.sim.SimilarityQueries",
    "Scrub": "graft.text.Scrub",
    "TextQueries": "graft.text.TextQueries",
}
def qualify(expr, pkg):
    for short, full in QUALIFY.items():
        # qualify bare references (not already graft.x.Y)
        expr = re.sub(rf"(?<![\w.]){short}\b", full, expr)
    # inside its own package the graft.<pkg>. prefix is redundant but
    # harmless; keep it for uniformity.
    return expr

for (pkg, pack), es in packs.items():
    path = f"src/main/scala/graft/{pkg}/{pack}.scala"
    body = []
    body.append(f"package graft.{pkg}")
    body.append("")
    body.append("import org.apache.spark.sql.{DataFrame, SparkSession}")
    body.append("")
    body.append("import graft.QueryPack")
    body.append("")
    body.append(f"/** The graft.{pkg} registration unit: each entry pairs a")
    body.append("  * registered query with its DuckDB oracle AT THE DECLARATION")
    body.append("  * SITE, so the two can never drift apart (VERDICT r16 item 8;")
    body.append("  * SparkEntry is the union of packs, OracleSqlSpec pins it). */")
    body.append(f"object {pack} extends QueryPack {{")
    body.append("  val entries: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(")
    for name, qexpr, oexpr, comments in es:
        for c in comments:
            body.append(f"    {c}")
        body.append(f'    ("{name}",')
        body.append(f"      {qualify(qexpr, pkg)},")
        body.append(f"      {qualify(oexpr, pkg)}),")
    body.append("  )")
    body.append("}")
    open(path, "w").write("\n".join(body) + "\n")
    print("wrote", path)
