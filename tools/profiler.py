"""Profiling harness — reference CLI parity (spikex/cli/profile.py:13-71).

Workloads mirror the reference's three profiles, recast for the Spark
engine; output mirrors the reference (cProfile top-40 sorted by internal
time; peak-memory report when ``--memory``):

* ``matcher``   — compile + run the token-pattern matcher on a fixed
  CNN-paragraph-style workload (reference ``profile_matcher``).
* ``wikigraph`` — build the synthetic WikiGraph from dump lines
  (reference ``profile_wikigraph_load``).
* ``find_pages``— mention detection (blocking join path) over the workload
  text against the synthetic title dictionary (reference
  ``profile_wikigraph_exec``).

Memory profiling uses stdlib ``tracemalloc`` (memory_profiler is not in the
container); it reports peak allocation of the profiled call.

Usage: python tools/profiler.py {matcher|wikigraph|find_pages} [--memory]
"""

from __future__ import annotations

import pstats
import sys
import tracemalloc
from cProfile import Profile

sys.path.insert(0, ".")

_TEXT = """
Hong Kong (CNN) China's top military commander in Hong Kong has emphasized
the role of the People's Liberation Army (PLA) in upholding national
sovereignty in the city a day ahead of expected anti government protests.
Chen Daoxiang, the PLA commander in Hong Kong, was speaking days after
China announced plans to introduce a draconian new national security law
which threatens many of the semi autonomous city's civil liberties and
political freedoms. Garrison officers and soldiers are determined,
confident, and capable of safeguarding national sovereignty and development
interests and the long term prosperity and stability of Hong Kong, Chen
said Tuesday. Almost every official department in Hong Kong has issued
statements of support for the proposed law this week from the police to the
fire department and the Government Flying Service.
""" * 20


def profile_matcher() -> None:
    from spikex_spark.matcher import compile_patterns
    from spikex_spark.matcher.engine import match_doc, simple_tokenize

    spec = compile_patterns({
        "ORG": [[{"IS_TITLE": True, "OP": "+"}]],
        "LAW": [[{"LOWER": "national"}, {"LOWER": {"IN": ["security", "sovereignty"]}}]],
        "NUMS": [[{"LIKE_NUM": True}]],
        "LONG": [[{"LENGTH": {">=": 10}}]],
    })
    tokens = simple_tokenize(_TEXT)

    def func():
        for _ in range(20):
            match_doc(spec, tokens)

    _profile(func)


def profile_wikigraph() -> None:
    import tempfile
    from pathlib import Path

    import pandas as pd
    from spikex_spark.session import get_spark
    from spikex_spark.sources import read_wiki_dump
    from spikex_spark.wikigraph import build_wikigraph
    from tests.test_wikigraph import LINKS_DUMP, PAGE_DUMP, REDIRECT_DUMP

    spark = get_spark(app_name="profile")
    d = Path(tempfile.mkdtemp(prefix="spikex_profile_"))
    (d / "page.sql").write_text(PAGE_DUMP + "\n")
    (d / "redirect.sql").write_text(REDIRECT_DUMP + "\n")
    (d / "links.sql").write_text(LINKS_DUMP + "\n")

    def func():
        pages = read_wiki_dump(spark, str(d / "page.sql"), "page")
        redirects = read_wiki_dump(spark, str(d / "redirect.sql"), "redirect")
        links = read_wiki_dump(spark, str(d / "links.sql"), "categorylinks")
        props = spark.createDataFrame(pd.DataFrame(
            {"pageid": [15, 16], "prop": ["hiddencat", "disambiguation"]}))
        wg = build_wikigraph(pages, props, redirects, links)
        wg.pages.count()

    _profile(func)


def profile_find_pages() -> None:
    from spikex_spark.operators import blocking as B
    from spikex_spark.session import get_spark
    from spikex_spark.synth import gen_titles

    spark = get_spark(app_name="profile")
    docs = spark.createDataFrame(
        [(i, _TEXT) for i in range(50)], ["doc_id", "extracted"])
    titles = spark.createDataFrame(gen_titles())
    keys = B.title_keys(titles)

    def func():
        B.mentions(docs, keys, id_col="doc_id", text_col="extracted") \
            .write.format("noop").mode("overwrite").save()

    _profile(func)


def _profile(fn) -> None:
    if "--memory" in sys.argv:
        tracemalloc.start()
        fn()
        current, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        print(f"current={current / 1e6:.1f}MB peak={peak / 1e6:.1f}MB")
        return
    profiler = Profile()
    profiler.runcall(fn)
    stats = pstats.Stats(profiler)
    stats.sort_stats("time")
    stats.print_stats(40)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    which = args[0] if args else "matcher"
    workloads = {"matcher": profile_matcher,
                 "wikigraph": profile_wikigraph,
                 "find_pages": profile_find_pages}
    if which not in workloads:
        raise SystemExit(
            f"unknown workload {which!r}; choose from {sorted(workloads)}"
        )
    workloads[which]()


if __name__ == "__main__":
    main()
