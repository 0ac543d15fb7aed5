"""Generated pinyin table: coverage, correctness, and the reference's Han
replay contract (qwen_hotword_service.rs:734-777 cases that rely on pinyin
homophone matching rather than learned aliases)."""

from light_whisper_tpu.text.hotwords import HotWordCorrector
from light_whisper_tpu.text.pinyin import char_pinyin, pinyin_signature, pinyin_table


def test_table_is_broad():
    # 18.7k characters recovered from CLDR collation + curated anchors; the
    # floor guards against regressions in the generator or data file.
    assert len(pinyin_table()) >= 18_000


def test_interpolated_readings_are_correct():
    # None of these rare-ish characters are generator anchors — they resolve
    # purely through collation-line labeling, so they pin the recovery logic.
    for ch, want in [
        ("鑫", "xin"), ("淼", "miao"), ("犇", "ben"), ("璀", "cui"),
        ("璨", "can"), ("嵘", "rong"), ("骁", "xiao"), ("玺", "xi"),
        ("烨", "ye"), ("曦", "xi"), ("邯", "han"), ("郸", "dan"),
        ("昊", "hao"), ("斓", "lan"), ("霁", "ji"),
    ]:
        assert char_pinyin(ch) == want, (ch, char_pinyin(ch), want)


def test_polyphone_overlays_use_dominant_reading():
    # CLDR collates these under a secondary reading; the hand overlay wins.
    assert char_pinyin("佛") == "fo"
    assert char_pinyin("咳") == "ke"
    assert char_pinyin("谁") == "shei"


def test_unknown_char_stays_conservative_miss():
    assert pinyin_signature("智☆") is None  # unmapped char → ineligible span
    assert pinyin_signature("智〇") == ["zhi", "ling"]  # bonus: 〇 resolved


def test_reference_replay_homophones():
    """The reference's replay corpus pinyin cases (qwen_hotword_service.rs:
    736-777): 智朴→智谱, plus the p95-benchmark sentence's 同机大学→同济大学
    and 划词住手→划词助手. Round-1 review: these chars were missing."""
    corrector = HotWordCorrector()
    assert corrector.correct("智朴", ["智谱"]) == "智谱"
    assert (
        corrector.correct("请检查同机大学的项目", ["同济大学"])
        == "请检查同济大学的项目"
    )
    assert corrector.correct("打开划词住手", ["划词助手"]) == "打开划词助手"


def test_replay_unchanged_cases_stay_unchanged():
    corrector = HotWordCorrector()
    for text in ["语音助手已经打开。", "统计结果已经完成。", "渲染任务已经完成。"]:
        # no matching hot word → untouched (reference unchanged cases)
        assert corrector.correct(text, ["智谱"]) == text
