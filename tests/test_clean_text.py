"""Golden parity for the cleaning battery.

Expected strings are the exact assertions of the reference's own test suite
(``/root/reference/tests/test_hard_text_cleaning.py:4-48``) — the
byte-identical contract of BASELINE.json input_hint.
"""

import pandas as pd
import pytest

from harvesttext_spark.functions.cleaning import (
    clean_text_py,
    make_clean_text_udf,
    clean_text_native,
)
from pyspark.sql import functions as F

GOLDEN = [
    ("捧杀！干得漂亮！[doge] \\u200b\\u200b\\u200b", {}, "捧杀！干得漂亮！"),
    ("捧杀！干得漂亮！[doge] ​​​", {}, "捧杀！干得漂亮！"),
    (
        "#缺钱找新浪# 瞎找不良网贷不如用新浪官方借款，不查负债不填联系人。  http://t.cn/A643boyi \n"
        "新浪[浪]用户专享福利，[浪]新浪产品用的越久额度越高，借万元日利率最低至0.03%，"
        "最长可分12期慢慢还！ http://t.cn/A643bojv  http://t.cn/A643bKHS ​​​",
        {},
        "#缺钱找新浪# 瞎找不良网贷不如用新浪官方借款，不查负债不填联系人。\n"
        "新浪用户专享福利，新浪产品用的越久额度越高，借万元日利率最低至0.03%，最长可分12期慢慢还！",
    ),
    (
        "各位大神们🙏求教一下这是什么动物呀！[疑问]\n\n为什么它同时长得有点吓人又有点可爱[允悲]\n\n"
        "#thosetiktoks# http://t.cn/A6bXIC44 ​​​",
        {},
        "各位大神们求教一下这是什么动物呀！\n为什么它同时长得有点吓人又有点可爱\n#thosetiktoks#",
    ),
    (
        "JJ棋牌数据4.3万。数据链接http://www.jj.cn/，数据第一个账号，第二个密码，95%可登录，"
        "可以登录官网查看数据是否准确",
        {},
        "JJ棋牌数据4.3万。数据链接，数据第一个账号，第二个密码，95%可登录，可以登录官网查看数据是否准确",
    ),
    (
        "发布了头条文章：《【XT】每日开工链新事儿 06.30 星期二》  "
        "[http://t.cn/A6LsKirA#区块链[超话]#](http://t.cn/A6LsKirA#%E5%8C%BA%E5%9D%97%E9%93%BE[%E8%B6%85%E8%AF%9D]#) "
        "#数字货币[超话]# #买价值币，只选XT# #比特币[超话]# #XT每日开工链新事儿? 06.30# #腾讯回应起诉老干妈#",
        {"markdown_hyperlink": True, "weibo_topic": True},
        "发布了头条文章：《【XT】每日开工链新事儿 06.30 星期二》",
    ),
    (
        "【#马化腾状告陶华碧#，#腾讯请求查封贵州老于妈公司1624万财产#】6月30日，据中国裁判文书网，"
        "【】广东省深圳市南山区人民法院发布一则民事裁定书",
        {"custom_regex": r"【.*?】"},
        "6月30日，据中国裁判文书网，广东省深圳市南山区人民法院发布一则民事裁定书",
    ),
    (
        "#嘎龙[超话]#【云次方/嘎龙】 回忆录?!1-2 http://t.cn/A6yvkujb 3 http://t.cn/A6yvkGO 4 http://t.cn/A6yZ59m0",
        {
            "weibo_topic": True,
            "custom_regex": [
                r"【.*?】",
                r"[0-9\-]* +http[s]?://(?:[a-zA-Z]|[0-9]|[#$%*-;=?&@~.&+]|[!*,])+",
            ],
        },
        "回忆录?!",
    ),
]


@pytest.mark.parametrize("raw,flags,expected", GOLDEN)
def test_clean_text_py_golden(raw, flags, expected):
    assert clean_text_py(raw, **flags) == expected


def test_clean_text_udf_golden(spark):
    """The Arrow-batched UDF must match the scalar path byte-for-byte."""
    default_cases = [(i, raw, exp) for i, (raw, fl, exp) in enumerate(GOLDEN) if not fl]
    df = spark.createDataFrame(
        pd.DataFrame(default_cases, columns=["i", "raw", "expected"])
    )
    out = df.withColumn("clean", make_clean_text_udf()(F.col("raw"))).collect()
    for row in out:
        assert row["clean"] == row["expected"], row["i"]


def test_clean_text_udf_flagged(spark):
    for raw, flags, expected in GOLDEN:
        if not flags:
            continue
        df = spark.createDataFrame([(raw,)], "raw string")
        got = df.select(make_clean_text_udf(**flags)(F.col("raw"))).first()[0]
        assert got == expected


def test_conflicting_flags_raise():
    with pytest.raises(Exception):
        clean_text_py("x", norm_url=True, to_url=True)


def test_native_fast_path_on_simple_corpus(spark):
    """Golden-gate the Catalyst-native regexp chain: on markup/url/email/space
    noise WITHOUT astral-plane or zh-@mention corner cases it must agree
    byte-for-byte with the Python-re battery."""
    rows = [
        ("hello <b>world</b>   and  more",),
        ("link http://ex.com/a?b=1 tail",),
        ("mail me a.b-c@ex-ample.org now",),
        ("[doge] leading emoticon",),
        ("markdown [text](http://x.y) stays",),
        ("spaces\t\tand\n\nnewlines",),
    ]
    df = spark.createDataFrame(rows, "raw string")
    got = df.select(
        clean_text_native(F.col("raw")).alias("native"),
        make_clean_text_udf()(F.col("raw")).alias("py"),
    ).collect()
    for r in got:
        assert r["native"] == r["py"]


def test_t2s_flag_battery():
    """Battery pass 16 (t2s) — un-stubbed via the committed char map;
    runs in the reference's pass position (after space dedup)."""
    from harvesttext_spark.functions.cleaning import clean_text_py

    assert clean_text_py("這是繁體中文測試", t2s=True) == "这是繁体中文测试"
    # combined with other passes: URL removed, then converted
    got = clean_text_py("請看 http://example.com 這裡的內容", t2s=True)
    assert got == "请看 这里的内容"
    # default flag off leaves traditional text untouched
    assert clean_text_py("這是") == "這是"


def test_t2s_catalyst_column(spark):
    from pyspark.sql import functions as F

    from harvesttext_spark.functions.t2s import t2s_col, t2s_py

    texts = ["漢語轉換", "繁體與簡體混合 mixed ascii 123", "纯简体不变"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r["out"] for r in df.select(t2s_col(F.col("text")).alias("out")).collect()]
    assert got == [t2s_py(t) for t in texts]
    assert got[0] == "汉语转换"


T2S_PHRASE_CASES = {
    # protections: chars inside these phrases must NOT char-convert
    "乾隆年間天氣乾燥，答覆說請喝一杯乾杯酒": "乾隆年间天气干燥，答复说请喝一杯干杯酒",
    "他的著作很顯著，看著辦": "他的著作很显著，看着办",
    "狼藉一片，藉口與憑藉": "狼藉一片，借口与凭借",
    # overrides the char map cannot express + plain char mapping
    "甚麼是繁體字？一隻鳥": "什么是繁体字？一只鸟",
    # longest-first: 著作權 wins over its substring 著作
    "著作權與著作": "著作权与著作",
    # round-4 bulk table: 瞭 liao3 overrides vs 瞭望 (liao4) default-stay
    "他瞭解情況，一目瞭然，站上瞭望塔": "他了解情况，一目了然，站上瞭望塔",
    # 徵 zhi3 music-note protection vs default 徵→征
    "變徵之聲，出征之路": "变徵之声，出征之路",
    # name special-cases: 錢鍾書 keeps 锺, 樊於期 keeps 於 (else 於→于)
    "錢鍾書與樊於期生於亂世": "钱锺书与樊於期生于乱世",
    # 乾 gan1 override family + qian2 protection in one sentence
    "外強中乾的人在乾清宮吃葡萄乾": "外强中干的人在乾清宫吃葡萄干",
    "執著的藉此反覆覆蓋覆核": "执著的借此反复覆盖复核",
}


def test_t2s_chain_overlap_divergence():
    """PINNED divergence from OpenCC's leftmost-longest trie (documented
    in t2s.py): overlapping phrase occurrences resolve in global chain
    order — 名著 substitutes before 著名 can match, so the first 著
    falls back to the char default.  Bounded failure mode: a protection
    losing an overlap yields the char-level default, never garbage."""
    from harvesttext_spark.functions.t2s import t2s_py

    assert t2s_py("的著名著作") == "的着名著作"  # OpenCC would keep 著名
    assert t2s_py("著名") == "著名"              # no overlap -> protected


def test_t2s_phrase_exceptions_python():
    """OpenCC TSPhrases-style layer (round 3): protections and overrides
    applied before the char map via placeholder substitution."""
    from harvesttext_spark.functions.t2s import t2s_py

    for inp, want in T2S_PHRASE_CASES.items():
        assert t2s_py(inp) == want, inp
    # battery pass 16 is phrase-aware too (OpenCC itself is)
    from harvesttext_spark.functions.cleaning import clean_text_py

    assert clean_text_py("乾隆愛著作", t2s=True) == "乾隆爱著作"


def test_t2s_phrase_three_engines_agree(spark):
    """Python, Catalyst, and the DuckDB oracle expression run the same
    replace/translate chain — value-identical by construction, checked."""
    import duckdb
    from pyspark.sql import functions as F

    from harvesttext_spark.functions.t2s import t2s_col, t2s_py, t2s_sql

    texts = list(T2S_PHRASE_CASES) + ["pure ascii", "纯简体不变"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r["o"] for r in df.select(t2s_col(F.col("text")).alias("o")).collect()]
    assert got == [t2s_py(t) for t in texts]
    con = duckdb.connect()
    for t, g in zip(texts, got):
        esc = t.replace("'", "''")
        (d,) = con.execute("SELECT " + t2s_sql(f"'{esc}'")).fetchone()
        assert d == g, t


def test_t2s_pua_collision_guard(spark):
    """Input already containing BMP private-use chars (icon fonts in
    scraped web text) must NOT be rewritten into phrase simplified forms
    by the placeholder-restore pass — the guard deletes the PUA block
    first, identically in all three engines."""
    import duckdb
    from pyspark.sql import functions as F

    from harvesttext_spark.functions.t2s import t2s_col, t2s_py, t2s_sql

    p0 = chr(0xE000)   # phrase 0's own placeholder — worst-case collision
    apple = chr(0xF8FF)  # end of the guarded range (Apple-logo slot)
    texts = [
        f"icon {p0} font",        # unguarded: injects phrase 0's target
        f"{p0}{apple} 漢語 {p0}",  # PUA mixed with real conversion work
        f"end-of-range {apple} only",
    ]
    want = ["icon  font", " 汉语 ", "end-of-range  only"]
    assert [t2s_py(t) for t in texts] == want
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r["o"] for r in df.select(t2s_col(F.col("text")).alias("o")).collect()]
    assert got == want
    con = duckdb.connect()
    for t, w in zip(texts, want):
        esc = t.replace("'", "''")
        (d,) = con.execute("SELECT " + t2s_sql(f"'{esc}'")).fetchone()
        assert d == w, t


def test_canonical_url_cases(spark):
    """Hand-checkable canonicalization cases (dedup-key semantics)."""
    from pyspark.sql import functions as F

    from harvesttext_spark.functions.urls import canonical_url

    cases = {
        "HTTPS://WWW.Example.COM:443/Path/X?utm_source=a&id=3#frag":
            "https://www.example.com/Path/X?id=3",
        "http://Site.org:80/a/B?utm_campaign=x&q=1&gclid=zz":
            "http://site.org/a/B?q=1",
        "https://cdn.net/img?fbclid=f": "https://cdn.net/img",
        "https://a.b/p?x=1&y=2": "https://a.b/p?x=1&y=2",  # untouched
        "not a url at all": "not a url at all",
        "http://h:8080/keep?port=1": "http://h:8080/keep?port=1",  # non-default port
    }
    df = spark.createDataFrame([(u,) for u in cases], "u string")
    got = {
        r["u"]: r["c"]
        for r in df.select("u", canonical_url(F.col("u")).alias("c")).collect()
    }
    for raw, want in cases.items():
        assert got[raw] == want, (raw, got[raw])


def test_t2s_three_engine_fuzz(spark):
    """Seeded fuzz over the dangerous alphabet — phrase chars (incl.
    overlapping-phrase substrings), PUA placeholders, the full char-map
    range sample, ascii — all three engines must agree byte-for-byte on
    every string (the value-identity contract under adversarial input)."""
    import random

    import duckdb
    from pyspark.sql import functions as F

    from harvesttext_spark.functions.t2s import (
        t2s_col,
        t2s_pairs,
        t2s_phrase_pairs,
        t2s_py,
        t2s_sql,
    )

    rng = random.Random(7)
    phrase_chars = sorted({c for t, _ in t2s_phrase_pairs() for c in t})
    char_sample = [t for t, _ in t2s_pairs()[::97]]
    pua = [chr(0xE000 + i) for i in range(4)] + [chr(0xF8FF)]
    alphabet = phrase_chars + char_sample + pua + list("ab ,")
    texts = []
    for _ in range(120):
        n = rng.randint(0, 14)
        texts.append("".join(rng.choice(alphabet) for _ in range(n)))
    # plus whole phrases glued together (overlap stress)
    ph = [t for t, _ in t2s_phrase_pairs()]
    for _ in range(40):
        texts.append("".join(rng.choice(ph) for _ in range(rng.randint(1, 3))))

    want = [t2s_py(t) for t in texts]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r["o"] for r in df.select(t2s_col(F.col("text")).alias("o")).collect()]
    assert got == want
    con = duckdb.connect()
    con.execute("CREATE TABLE tt(i INT, text VARCHAR)")
    con.executemany("INSERT INTO tt VALUES (?, ?)", list(enumerate(texts)))
    drows = con.execute(
        "SELECT " + t2s_sql("text") + " FROM tt ORDER BY i"
    ).fetchall()
    assert [r[0] for r in drows] == want
