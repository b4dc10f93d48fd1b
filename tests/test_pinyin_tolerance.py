"""Pinyin-tolerance fuzzy linking — port of the reference
test_entity_error_check (/root/reference/tests/test_functionality.py:281-296
and its _expected golden), span-exact."""

import pytest

from harvesttext_spark.functions.pinyin import lazy_pinyin
from harvesttext_spark.operators.linking import EntityKB


@pytest.fixture()
def kb():
    kb = EntityKB()
    kb.add("武磊", "武磊", "人名")  # add_typed_words({"人名": ["武磊"]})
    return kb


def test_lazy_pinyin_semantics():
    assert lazy_pinyin("武磊") == ["wu", "lei"]
    assert lazy_pinyin("吴力") == ["wu", "li"]
    # non-han runs pass through as single items (pypinyin behavior)
    assert lazy_pinyin("#人名#") == ["#", "ren", "ming", "#"]
    assert lazy_pinyin("abc中xyz") == ["abc", "zhong", "xyz"]


def test_pinyin_correct_candidates(kb):
    # 吴力 (wu li) is one pinyin edit from 武磊 (wu lei)
    assert kb.get_pinyin_correct_candidates("吴力") == ["武磊"]
    assert kb.get_pinyin_correct_candidates("武磊") == ["武磊"]
    assert kb.get_pinyin_correct_candidates("武磊", tolerance=0) == ["武磊"]
    assert kb.get_pinyin_correct_candidates("吴力", tolerance=0) == []


def test_entity_error_check_pinyin_golden(kb):
    """golden line 2: 武磊和吴力只差一个拼音 with pinyin_tolerance=1 links
    both (0,2) exact and (3,5) via pinyin."""
    spans = kb.link_with_recheck(
        "武磊和吴力只差一个拼音", char_tolerance=None, pinyin_tolerance=1
    )
    assert [(l, r, e, t) for l, r, e, t in spans] == [
        (0, 2, "武磊", "#人名#"),
        (3, 5, "武磊", "#人名#"),
    ]


def test_entity_error_check_char_golden(kb):
    """golden line 4: 武磊和吴磊只差一个字 with char_tolerance=1."""
    spans = kb.link_with_recheck("武磊和吴磊只差一个字", char_tolerance=1)
    assert [(l, r, e, t) for l, r, e, t in spans] == [
        (0, 2, "武磊", "#人名#"),
        (3, 5, "武磊", "#人名#"),
    ]


def test_get_linking_mention_candidates_golden(kb):
    """golden line 6: 吴磊和吴力都可能是武磊的代称 with both tolerances —
    ('吴磊和吴力都可能是武磊的代称', {(0,2):{武磊}, (3,5):{武磊}, (9,11):{武磊}})."""
    sent2, cands = kb.get_linking_mention_candidates(
        "吴磊和吴力都可能是武磊的代称", pinyin_tolerance=1, char_tolerance=1
    )
    assert sent2 == "吴磊和吴力都可能是武磊的代称"
    assert cands == {
        (0, 2): {"武磊"},
        (3, 5): {"武磊"},
        (9, 11): {"武磊"},
    }


def test_pinyin_dict_rebuilds_on_kb_change(kb):
    assert kb.get_pinyin_correct_candidates("吴力") == ["武磊"]
    kb.add("吴力", "吴力", "人名")
    got = kb.get_pinyin_correct_candidates("吴力")
    assert "吴力" in got and "武磊" in got
