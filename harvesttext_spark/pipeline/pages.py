"""Deterministic synthetic Common-Crawl-style `pages` table.

Schema per BASELINE.json input_hint:
    (url string, warc_ts timestamp, html binary, text string, lang string)

Generation is DISTRIBUTED and seed-stable: ``spark.range(n)`` partitions the
id space, and every column is a pure function of the row id (per-row
``random.Random(seed ^ id)`` inside an Arrow-batched ``mapInPandas``).  The
same (seed, n) always produces the same table regardless of partitioning or
cluster size — the property the resume/lineage story depends on.

Domains follow a Zipfian distribution (rank-weighted) so the skew-handling
path (salted repartition) is actually exercised.  Text rows mix:
  * weibo-style zh posts with URLs / emails / @mentions / [表情] / emoji /
    zero-width chars (the clean_text battery's diet),
  * plain zh prose sentences,
  * en/es/de/fr marker-word prose (langid diet),
  * junk: too-short rows, repeated-char runs, whitespace soup (drop labels).
"""

from __future__ import annotations

import random

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)

_ZH_SENTS = [
    "今天的比赛非常精彩，武磊在上半场打进一球。",
    "据新闻报道，公司股价连续三天上涨。",
    "这家餐厅的菜品味道不错，值得推荐给朋友。",
    "科学家发现了一种新的材料，可以提高电池寿命。",
    "周末去公园散步，天气很好，心情愉快。",
    "转发微博 请大家关注最新的活动信息。",
    "城市交通拥堵问题需要长期的规划来解决。",
]
_LANG_SENTS = {
    "en": "the quick brown fox jumps over the lazy dog and it was good for everyone that day",
    "es": "el perro corre en la casa y los gatos duermen bajo una mesa grande que vimos",
    "de": "der hund und die katze sind nicht in das haus mit einem garten zu sehen",
    "fr": "le chat et la souris sont dans les jardins pour une belle journée que nous aimons",
}
_EMOTICONS = ["[doge]", "[允悲]", "[疑问]", "[浪]", "[笑cry]"]
_EMOJIS = ["🙏", "😄", "🚀", "🌊"]
_TLDS = ["com", "cn", "org", "net"]
_N_DOMAINS = 1000


def _domain_for(rng: random.Random) -> str:
    # Zipf-ish: rank r with probability ∝ 1/r over _N_DOMAINS ranks
    r = min(int(rng.paretovariate(1.0)), _N_DOMAINS)
    return f"site{r}.{_TLDS[r % len(_TLDS)]}"


def _make_row(seed: int, i: int, latin_frac: float | None = None) -> tuple:
    rng = random.Random((seed << 32) ^ i)
    domain = _domain_for(rng)
    url = f"https://{domain}/p/{i}"
    ts = pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=i % 86_400_000)
    if latin_frac is not None:
        return _make_latin_row(rng, url, ts, domain, i, latin_frac)
    kind = rng.random()
    if kind < 0.08:  # junk: too short
        text, lang = rng.choice(["好", "ok", "??", "x", "短文本"]), "zh"
    elif kind < 0.13:  # junk: repeated chars
        text, lang = rng.choice(["哈", "a", "!"]) * rng.randint(12, 40), "zh"
    elif kind < 0.18:  # junk: low-alnum soup
        text, lang = " ".join(["@#$%^&*"] * rng.randint(5, 12)), "zh"
    elif kind < 0.55:  # weibo-style zh post with markup noise
        parts = rng.sample(_ZH_SENTS, k=rng.randint(2, 4))
        noisy = []
        for p in parts:
            if rng.random() < 0.5:
                p += " http://t.cn/A6" + "".join(rng.choices("abcdXYZ123", k=6)) + " "
            if rng.random() < 0.3:
                p = f"回复@user{rng.randint(1,99)}: " + p
            if rng.random() < 0.4:
                p += rng.choice(_EMOTICONS)
            if rng.random() < 0.2:
                p += rng.choice(_EMOJIS)
            if rng.random() < 0.2:
                p += f" 联系 user{rng.randint(1,99)}@example.{rng.choice(_TLDS)} "
            noisy.append(p)
        text = "  ".join(noisy) + ("​" * rng.randint(0, 3))
        lang = "zh"
    elif kind < 0.8:  # zh prose
        text, lang = "".join(rng.sample(_ZH_SENTS, k=rng.randint(3, 6))), "zh"
    else:  # other languages
        lang = rng.choice(list(_LANG_SENTS))
        words = _LANG_SENTS[lang].split()
        text = " ".join(rng.choices(words, k=rng.randint(25, 80))) + "."
    html_doc = (
        f"<html><head><title>page {i}</title></head><body>"
        f"<p>{text}</p><div class='footer'>&nbsp;&copy; {domain}</div>"
        f"</body></html>"
    ).encode("utf-8")
    return url, ts, html_doc, text, lang


def _make_latin_row(
    rng: random.Random, url: str, ts, domain: str, i: int, latin_frac: float
) -> tuple:
    """Common-Crawl-realistic mix: ``latin_frac`` of rows are PURE-ASCII
    latin prose (with ASCII urls/emails/@handles so the battery still has
    work), the rest zh prose + junk — the corpus shape where the ASCII
    Catalyst fast path earns its keep."""
    kind = rng.random()
    if kind < 0.04:
        text, lang = rng.choice(["ok", "x", "??", "hm"]), "en"
    elif kind < 0.08:
        text, lang = rng.choice(["a", "!", "z"]) * rng.randint(12, 40), "en"
    elif kind < 0.10:
        text, lang = " ".join(["@#$%^&*"] * rng.randint(5, 12)), "en"
    elif kind < 0.10 + latin_frac:
        lang = rng.choice(["en", "en", "en", "es", "de", "fr"])
        words = _LANG_SENTS[lang].split()
        parts = [" ".join(rng.choices(words, k=rng.randint(20, 60))) + "."]
        if rng.random() < 0.4:
            parts.append("see http://" + domain + "/a" + str(rng.randint(1, 999)))
        if rng.random() < 0.2:
            parts.append(f"contact user{rng.randint(1,99)}@example.com")
        if rng.random() < 0.2:
            parts.append(f"@handle{rng.randint(1,99)}: thanks")
        text = "  ".join(parts)
    else:
        text, lang = "".join(rng.sample(_ZH_SENTS, k=rng.randint(3, 6))), "zh"
    html_doc = (
        f"<html><head><title>page {i}</title></head><body>"
        f"<p>{text}</p><div class='footer'>&nbsp;&copy; {domain}</div>"
        f"</body></html>"
    ).encode("utf-8")
    return url, ts, html_doc, text, lang


def synthesize_pages(
    spark: SparkSession,
    n: int = 10_000,
    seed: int = 42,
    partitions: int | None = None,
    latin_frac: float | None = None,
) -> DataFrame:
    """Distributed deterministic pages table (seed-stable per row id).
    ``latin_frac`` switches to the latin-majority Common-Crawl-style mix."""
    base = spark.range(0, n, numPartitions=partitions or spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            rows = [_make_row(seed, int(i), latin_frac) for i in pdf["id"]]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return base.mapInPandas(gen, schema=PAGES_SCHEMA)
