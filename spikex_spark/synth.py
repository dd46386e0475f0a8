"""Deterministic synthetic fixtures per FIXTURES.md.

Generates the `pages` table (the BASELINE.json ``input_hint`` shape:
url, warc_ts, html, text, lang), the `titles` dimension, `category_links`
edges, and the `labeled_pairs` gold table used for the pairwise-F1 gate.

Everything is seeded (`random.Random(seed)`) so tests and the oracle see
byte-identical inputs across runs and across machines. Entity clusters are
planted so that the transitive closure of positive pairs is consistent
(cluster F1 and pairwise F1 agree — FIXTURES.md §4).
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

from pyspark.sql import functions as F

from .textutils import norm_title_key

# Entities: (canonical title, list of surface variants). Variants share the
# normalized-title blocking key (qualifier-stripped, lowercased) so blocking
# recall is 100% on gold pairs by construction.
# Variants within a cluster are case/spacing renderings of the SAME canonical
# title (token-identical after normalization), so a scorer combining
# Jaro-Winkler + token-Jaccard separates them cleanly from the cross-entity
# pairs that share a blocking key (Apple company vs fruit, Python language vs
# snake) — those differ in qualifier tokens.
_ENTITIES = [
    ("Apple_(company)", ["Apple_(company)", "apple_(company)", "Apple_(COMPANY)"]),
    ("Apple_(fruit)", ["Apple_(fruit)", "apple_(fruit)"]),
    ("Python_(programming_language)", [
        "Python_(programming_language)", "python_(programming_language)",
        "Python_(Programming_Language)"]),
    ("Python_(snake)", ["Python_(snake)", "python_(snake)"]),
    ("New_York_City", ["New_York_City", "new_york_city", "New_York_city"]),
    ("Machine_learning", ["Machine_learning", "machine_learning"]),
    ("Apache_Spark", ["Apache_Spark", "apache_spark", "Apache_SPARK"]),
    ("Entity_resolution", ["Entity_resolution", "entity_resolution"]),
]

# Adversarial near-misses (gate hardening): entity groups that share a
# blocking key but are engineered to land NEAR the 0.75 match threshold —
# prefix-equal Jaro-Winkler traps (long identical prefix, qualifier differs
# late: JW ≈ .92 but Jaccard .5 → score ≈ .71, must NOT match), qualifier
# collisions (score ≈ .6), and a transposed-qualifier POSITIVE (token set
# identical → Jaccard 1.0 rescues the JW dip: ≈ .98, must match). A scorer
# that leaned only on JW, or only on token overlap, flips one of these —
# unlike the base _ENTITIES, whose cross pairs sit far from the threshold.
# Surfaces use words absent from every testdata documents.parquet text, so
# planting them changes no documents-table contract query.
_HARD_ENTITIES = [
    ("Johnson_City_(Tennessee)",
     ["Johnson_City_(Tennessee)", "johnson_city_(tennessee)"]),
    ("Johnson_City_(Texas)",
     ["Johnson_City_(Texas)", "johnson_city_(texas)"]),
    ("Mercury_(planet)", ["Mercury_(planet)", "mercury_(planet)"]),
    ("Mercury_(element)", ["Mercury_(element)", "mercury_(element)"]),
    ("Springfield_(Massachusetts)",
     ["Springfield_(Massachusetts)", "SPRINGFIELD_(MASSACHUSETTS)"]),
    ("Springfield_(Minnesota)",
     ["Springfield_(Minnesota)", "springfield_(minnesota)"]),
    ("Georgia_(country)", ["Georgia_(country)", "georgia_(country)"]),
    ("Georgia_(state)", ["Georgia_(state)", "georgia_(state)"]),
    ("Riverside_(county_seat)",
     ["Riverside_(county_seat)", "Riverside_(seat_county)",
      "riverside_(county_seat)"]),
]

_FILLER = (
    "the of a in and to for with on by from page web site data text "
    "record link graph match block score cluster node edge title"
).split()

_BOILERPLATE = (
    "copyright notice all rights reserved terms of service privacy policy "
    "cookie settings subscribe newsletter follow us contact about"
)


def gen_pages(n: int = 200, seed: int = 42) -> list[dict]:
    """Rows: url, warc_ts, html, text, lang.

    Plants: (a) entity clusters — several urls per entity, each rendered with
    a different surface variant plus noise words; (b) a HUB key — many urls
    mentioning the bare title "Apple" (skew exercise, FIXTURES.md §1);
    (c) boilerplate near-duplicates across many urls.
    """
    rng = random.Random(seed)
    t0 = datetime(2024, 3, 1, tzinfo=timezone.utc)
    rows = []
    uid = 0

    def emit(text: str, tag: str) -> None:
        nonlocal uid
        url = f"https://ex{uid % 7}.org/{tag}/{uid:06d}"
        ts = t0 + timedelta(seconds=uid * 137)
        rows.append({
            "url": url,
            "warc_ts": ts,
            "html": (f"<html><body><p>{text}</p></body></html>").encode(),
            "text": text,
            "lang": "en" if uid % 11 else "de",
        })
        uid += 1

    # (a) entity-cluster pages: ~60% of n
    n_entity = max(len(_ENTITIES) * 2, int(n * 0.6))
    for i in range(n_entity):
        canon, variants = _ENTITIES[i % len(_ENTITIES)]
        variant = variants[i % len(variants)]
        mention = variant.replace("_", " ")
        noise = " ".join(rng.choice(_FILLER) for _ in range(rng.randint(8, 25)))
        text = f"{noise} {mention} {rng.choice(_FILLER)} {noise[:30]}"
        emit(text, f"ent{i % len(_ENTITIES)}")

    # (b) hub pages: one hot blocking key ("apple" bare)
    n_hub = max(10, int(n * 0.2))
    for i in range(n_hub):
        noise = " ".join(rng.choice(_FILLER) for _ in range(rng.randint(5, 15)))
        emit(f"Apple {noise}", "hub")

    # (c) adversarial near-miss pages (see _HARD_ENTITIES) — carved out of
    # the boilerplate share so entity/hub page streams stay unchanged
    n_hard = max(len(_HARD_ENTITIES) * 2, int(n * 0.1))
    for i in range(n_hard):
        canon, variants = _HARD_ENTITIES[i % len(_HARD_ENTITIES)]
        # variant index = the group's OCCURRENCE count, not i: i steps by
        # len(_HARD_ENTITIES)=9 within a group, and 9 % 3 == 0 means a
        # 3-variant group would be stuck on one variant forever — the
        # transposed-qualifier POSITIVE (Riverside_(seat_county)) was never
        # emitted and the must-match trap sat vacuous
        mention = variants[(i // len(_HARD_ENTITIES))
                           % len(variants)].replace("_", " ")
        noise = " ".join(rng.choice(_FILLER) for _ in range(rng.randint(6, 20)))
        emit(f"{noise} {mention} {rng.choice(_FILLER)}",
             f"hrd{i % len(_HARD_ENTITIES)}")

    # (d) boilerplate near-duplicates
    n_boiler = max(10, n - uid)
    for i in range(n_boiler):
        extra = rng.choice(_FILLER)
        emit(f"{_BOILERPLATE} {extra}", "boiler")

    return rows


def gen_pages_scaled(n: int = 100_000, seed: int = 42,
                     pages_per_entity: int = 5, n_hub: int = 2000,
                     n_boiler: int = 2000) -> tuple[list[tuple], list[tuple]]:
    """Scaling-benchmark corpus: (pages, titles) with REALISTIC growth.

    Unlike ``gen_pages`` (8 fixed entities whose clusters grow with n —
    quadratic pair counts), here the ENTITY COUNT grows with n and cluster
    size stays ~pages_per_entity, matching how a web corpus scales: pair and
    edge counts are O(n), hub/boilerplate pages stay bounded. Returns plain
    tuples (url, text) and (title rows) to keep 100k-row driver generation
    cheap.
    """
    rng = random.Random(seed)
    n_entity_pages = max(0, n - n_hub - n_boiler)
    n_entities = max(1, n_entity_pages // pages_per_entity)
    pages: list[tuple] = []
    titles: list[tuple] = [(1, "Hub_topic", "page", False, None, [])]
    uid = 0

    def emit(text: str, tag: str) -> None:
        nonlocal uid
        pages.append((f"https://sc{uid % 13}.org/{tag}/{uid:08d}", text))
        uid += 1

    for e in range(n_entities):
        canonical = f"Entity_{e:07d}_(kind{e % 7})"
        titles.append((100 + e, canonical, "page", False, None, []))
        mention = canonical.replace("_", " ")
        variants = [mention, mention.lower(), mention.upper()]
        for p in range(pages_per_entity):
            if uid >= n_entity_pages:
                break
            noise = " ".join(rng.choice(_FILLER) for _ in range(rng.randint(6, 18)))
            emit(f"{noise} {variants[p % 3]} {rng.choice(_FILLER)}", f"e{e % 97}")
    while uid < n_entity_pages:
        emit(" ".join(rng.choice(_FILLER) for _ in range(10)), "pad")
    for _ in range(min(n_hub, n - uid)):
        noise = " ".join(rng.choice(_FILLER) for _ in range(rng.randint(5, 12)))
        emit(f"Hub topic {noise}", "hub")
    while uid < n:
        emit(f"{_BOILERPLATE} {rng.choice(_FILLER)}", "boiler")
    return pages, titles


def gen_pages_scaled_df(spark, n: int = 1_000_000, seed: int = 42,
                        pages_per_entity: int = 4, n_hub: int = 2000,
                        n_boiler: int = 2000, partitions: int = 256,
                        long_every: int = 0,
                        long_min_bytes: int = 10_000,
                        long_max_bytes: int = 500_000,
                        vocab: "int | None" = None):
    """Distributed scaling corpus: (pages_df, titles_df), built from
    ``spark.range`` + Catalyst expressions — NO driver-side row lists.

    ``gen_pages_scaled`` materializes python tuples on the driver, which
    caps practical corpus size around ~1M pages; this variant generates the
    same corpus SHAPE (O(n) entities with ~fixed cluster size, bounded
    hub/boilerplate tails) entirely on executors, so multi-million-page
    scaling runs cost seconds to synthesize. Deterministic: every "random"
    choice is ``xxhash64(uid, seed, slot)`` arithmetic.

    pages_df carries the full BASELINE input_hint shape
    (url, warc_ts, html:binary, text, lang); pipeline consumers select
    (url, text) and Catalyst prunes the rest at the source.
    """
    n_entity_pages = max(0, n - n_hub - n_boiler)
    n_entities = max(1, n_entity_pages // pages_per_entity)
    filler = F.array(*[F.lit(w) for w in _FILLER])

    def pick(uid_col, slot):
        idx = F.pmod(F.xxhash64(uid_col, F.lit(seed), F.lit(slot)),
                     F.lit(vocab or len(_FILLER)))
        if not vocab or vocab <= len(_FILLER):
            return F.element_at(filler, (idx + 1).cast("int"))
        # open-vocabulary mode (multi-million-page runs): hash-drawn
        # pseudo-words (base-36 of the slot hash). The 26-word filler
        # list saturates the char-shingle universe at ~10^6+ pages —
        # minhash signatures then collide corpus-wide and LSH buckets
        # grow to thousands of capped mega-blocks, a pair/shuffle shape
        # (~100 GB at 10M pages, OOM on this box) NO real Zipfian
        # crawl exhibits; real webtext keeps the shingle space open.
        return F.lower(F.conv((idx + F.lit(vocab)).cast("string"),
                              10, 36))

    base = spark.range(0, n, 1, partitions).withColumnRenamed("id", "uid")
    uid = F.col("uid")
    e = F.floor(uid / pages_per_entity)
    canonical = F.format_string("Entity_%07d_(kind%d)", e, F.pmod(e, F.lit(7)))
    mention = F.translate(canonical, "_", " ")
    variant = (
        F.when(F.pmod(uid, F.lit(3)) == 1, F.lower(mention))
        .when(F.pmod(uid, F.lit(3)) == 2, F.upper(mention))
        .otherwise(mention)
    )
    # 6-18 pseudo-random filler words (slot-hashed, so each position differs)
    n_noise = (F.pmod(F.xxhash64(uid, F.lit(seed), F.lit(-1)), F.lit(13)) + 6)
    noise = F.array_join(
        F.transform(F.sequence(F.lit(1), n_noise.cast("int")),
                    lambda i: pick(uid, i)), " ")
    is_entity = uid < F.lit(n_entity_pages)
    is_hub = (~is_entity) & (uid < F.lit(n_entity_pages + n_hub))
    text = (
        F.when(is_entity & (e < n_entities),
               F.concat(noise, F.lit(" "), variant, F.lit(" "), pick(uid, 99)))
        .when(is_entity, noise)  # pad tail: filler-only pages
        .when(is_hub, F.concat(F.lit("Hub topic "), noise))
        .otherwise(F.concat(F.lit(_BOILERPLATE), F.lit(" "), pick(uid, 98)))
    )
    if long_every:
        # long-document mix (round-5 absolute-scale leg): roughly one in
        # ``long_every`` pages gets its text extended to a hash-drawn
        # 10-500 KB target by repeating a boilerplate sentence seeded
        # with a per-doc word. Deterministic (pure uid/seed arithmetic),
        # O(len) to build (one repeat()), and deliberately boilerplate-
        # heavy: the long docs' near-identical shingle sets land in a
        # shared LSH mega-bucket, exercising the per-bucket cap — the
        # realistic shape of template pages on a crawl.
        sentence = F.concat(
            pick(uid, 97), F.lit(" "),
            F.lit(" ".join(_FILLER[:10])), F.lit(". "))
        tgt = (F.pmod(F.xxhash64(uid, F.lit(seed), F.lit(-3)),
                      F.lit(long_max_bytes - long_min_bytes))
               + F.lit(long_min_bytes))
        reps = (tgt / F.length(sentence)).cast("int") + 1
        is_long = F.pmod(F.xxhash64(uid, F.lit(seed), F.lit(-2)),
                         F.lit(long_every)) == 0
        text = F.when(is_long,
                      F.concat(text, F.lit(" "), F.repeat(sentence, reps))
                      ).otherwise(text)
    tag = (
        F.when(is_entity, F.format_string("e%d", F.pmod(e, F.lit(97))))
        .when(is_hub, F.lit("hub"))
        .otherwise(F.lit("boiler"))
    )
    pages_df = base.select(
        F.format_string("https://sc%d.org/%s/%08d", F.pmod(uid, F.lit(13)),
                        tag, uid).alias("url"),
        F.timestamp_seconds(F.lit(1_600_000_000) + uid).alias("warc_ts"),
        F.encode(F.format_string("<html><body><p>%s</p></body></html>", text),
                 "utf-8").alias("html"),
        text.alias("text"),
        F.when(F.pmod(uid, F.lit(11)) == 0, F.lit("de"))
        .otherwise(F.lit("en")).alias("lang"),
    )
    ent = F.col("id")
    titles_df = (
        spark.range(0, n_entities, 1, max(1, partitions // 8))
        .select(
            (ent + 100).alias("pageid"),
            F.format_string("Entity_%07d_(kind%d)", ent,
                            F.pmod(ent, F.lit(7))).alias("title"),
            F.lit("page").alias("kind"),
            F.lit(False).alias("is_redirect"),
            F.lit(None).cast("long").alias("redirect_to"),
            F.array().cast("array<string>").alias("props"),
        )
        .unionByName(spark.createDataFrame(
            [(1, "Hub_topic", "page", False, None, [])],
            "pageid long, title string, kind string, is_redirect boolean, "
            "redirect_to long, props array<string>"))
    )
    return pages_df, titles_df


def _write_dump_part(args: tuple) -> str:
    """One gzip part of a synthetic MySQL dump (Pool worker — top level so
    it pickles). ``spec`` rows follow the real dump column layouts that
    ``sources.parse_*_row`` expects."""
    import gzip

    kind, path, lo, hi, rows_per_line, n_titles = args
    # pageid scheme: category c -> 10+c, entity e -> 100+e,
    # redirect source j -> 100+n_titles+j (disjoint ranges)
    def page(i: int) -> str:
        if i < 7:   # category namespace rows (ns=14, no prefix in dumps)
            return f"({10 + i},14,'Kind_{i}','',0,0)"
        if i < 7 + n_titles:
            e = i - 7
            return f"({100 + e},0,'Entity_{e:07d}_(kind{e % 7})','',0,0)"
        j = i - 7 - n_titles   # redirect-source pages
        return f"({100 + n_titles + j},0,'Entity_{j:07d}_redirect','',0,0)"

    def redirect(j: int) -> str:
        e = j * 11 % n_titles
        return f"({100 + n_titles + j},0,'Entity_{e:07d}_(kind{e % 7})','','')"

    def pageprops(j: int) -> str:
        return f"({100 + j * 101},'hiddencat','',0)"

    def categorylinks(j: int) -> str:
        i = j * 17
        return f"({100 + i},'Kind_{i % 7}','x','page')"

    row = {"page": page, "redirect": redirect, "pageprops": pageprops,
           "categorylinks": categorylinks}[kind]
    with gzip.open(path, "wt") as f:
        f.write("-- synthetic MySQL dump\n")
        for start in range(lo, hi, rows_per_line):
            vals = ",".join(row(i) for i in
                            range(start, min(start + rows_per_line, hi)))
            f.write(f"INSERT INTO `{kind}` VALUES {vals};\n")
    return path


def gen_dump_parts(n_titles: int = 2_000_000, parts: int = 32,
                   rows_per_line: int = 1000, seed: int = 42,
                   base_dir: str = "/tmp") -> str:
    """Synthesize a MULTI-PART ``.sql.gz`` wiki dump (page / redirect /
    page_props / categorylinks) for source-path scaling runs; returns the
    dump dir.

    Real wiki dumps ship as many gzip members, and gzip is NOT splittable —
    a single ``.sql.gz`` would pin ``spark.read.text`` to one task, so part
    COUNT (not size) is the parallelism knob, exactly as on a cluster.
    ~5% of titles get a redirect-source page + redirect row, 1/101 a
    hiddencat prop, 1/17 a category link. Deterministic; cached under
    ``base_dir`` keyed by the parameters (a marker file gates reuse).
    """
    import json as _json
    import multiprocessing as mp
    from pathlib import Path

    out = Path(base_dir) / f"spikex_dump_{n_titles}_{parts}_{seed}"
    marker = out / "_complete.json"
    params = {"n_titles": n_titles, "parts": parts,
              "rows_per_line": rows_per_line, "seed": seed}
    if marker.exists() and _json.loads(marker.read_text()) == params:
        return str(out)
    out.mkdir(parents=True, exist_ok=True)
    n_red = n_titles // 20
    jobs = []
    for kind, total, nparts in (
        ("page", 7 + n_titles + n_red, parts),
        ("redirect", n_red, max(1, parts // 4)),
        ("pageprops", n_titles // 101, 1),
        ("categorylinks", n_titles // 17, max(1, parts // 4)),
    ):
        step = -(-total // nparts)
        for p in range(nparts):
            lo, hi = p * step, min((p + 1) * step, total)
            if lo >= hi:
                continue
            jobs.append((kind, str(out / f"{kind}-{p:04d}.sql.gz"),
                         lo, hi, rows_per_line, n_titles))
    with mp.Pool(min(16, len(jobs))) as pool:
        pool.map(_write_dump_part, jobs)
    marker.write_text(_json.dumps(params))
    return str(out)


def gen_titles(seed: int = 42) -> list[dict]:
    """`titles` dimension (FIXTURES.md §2) incl. a two-hop redirect chain."""
    rows = []
    pid = 100
    for canon, variants in _ENTITIES + _HARD_ENTITIES:
        rows.append({"pageid": pid, "title": canon, "kind": "page",
                     "is_redirect": False, "redirect_to": None, "props": []})
        canon_pid = pid
        pid += 1
        for v in variants:
            if v == canon:
                continue
            rows.append({"pageid": pid, "title": v, "kind": "page",
                         "is_redirect": True, "redirect_to": canon_pid,
                         "props": []})
            pid += 1
    # two-hop redirect chain: A -> B -> Apple_(company)
    rows.append({"pageid": pid, "title": "Apple_Computer", "kind": "page",
                 "is_redirect": True, "redirect_to": pid + 1, "props": []})
    rows.append({"pageid": pid + 1, "title": "Apple_Computer_Inc",
                 "kind": "page", "is_redirect": True, "redirect_to": 100,
                 "props": []})
    pid += 2
    # categories + hidden/noindex pages (filter F2 fixtures)
    rows.append({"pageid": pid, "title": "Category:Companies",
                 "kind": "category", "is_redirect": False,
                 "redirect_to": None, "props": []})
    rows.append({"pageid": pid + 1, "title": "Category:Fruits",
                 "kind": "category", "is_redirect": False,
                 "redirect_to": None, "props": []})
    rows.append({"pageid": pid + 2, "title": "Hidden_page", "kind": "page",
                 "is_redirect": False, "redirect_to": None,
                 "props": ["hiddencat"]})
    rows.append({"pageid": pid + 3, "title": "Apple", "kind": "disambiguation",
                 "is_redirect": False, "redirect_to": None,
                 "props": ["disambiguation"]})
    return rows


def gen_category_links(seed: int = 42) -> list[dict]:
    """Edges (FIXTURES.md §3): page→category and subcat→category."""
    titles = {r["title"]: r["pageid"] for r in gen_titles(seed)}
    comp, fruit = titles["Category:Companies"], titles["Category:Fruits"]
    return [
        {"src": titles["Apple_(company)"], "dst": comp, "cl_type": "page"},
        {"src": titles["Apache_Spark"], "dst": comp, "cl_type": "page"},
        {"src": titles["Apple_(fruit)"], "dst": fruit, "cl_type": "page"},
        {"src": fruit, "dst": comp, "cl_type": "subcat"},
    ]


def gen_labeled_pairs(n_pages: int = 200, seed: int = 42) -> list[dict]:
    """Gold pairs (FIXTURES.md §4): all within-block pairs of entity pages,
    labeled is_match = same planted entity. url_a < url_b."""
    pages = gen_pages(n_pages, seed)
    # recover the planted entity id from the url tag ("ent*" base corpus,
    # "hrd*" adversarial near-misses — see _HARD_ENTITIES)
    by_key: dict[str, list[tuple[str, str]]] = {}
    hard_keys: set[str] = set()
    for i, row in enumerate(pages):
        tag = row["url"].split("/")[3]
        if tag.startswith("ent"):
            canon, _ = _ENTITIES[int(tag[3:])]
        elif tag.startswith("hrd"):
            canon, _ = _HARD_ENTITIES[int(tag[3:])]
        else:
            continue
        key = norm_title_key(canon)
        if tag.startswith("hrd"):
            hard_keys.add(key)
        by_key.setdefault(key, []).append((row["url"], canon))
    out = []
    for key, members in sorted(by_key.items()):
        members.sort()
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                (ua, ea), (ub, eb) = members[i], members[j]
                out.append({"url_a": ua, "url_b": ub, "block_key": key,
                            "is_match": ea == eb,
                            "is_hard": key in hard_keys})
    return out
