"""CJK tokenizer — lindera-class segmentation behind the pluggable slot.

The reference tokenizes Chinese/Japanese/Korean with Lindera, a MeCab-style
morphological analyzer over external dictionaries (ipadic / cc-cedict /
ko-dic) — bayard/src/index/tokenizer/lindera.rs, docs/analyzers.md:101-155.
Those multi-hundred-MB dictionaries aren't shippable here, so this module
implements a DICTIONARY-LIGHT segmenter with the same config surface:

    {"name": "lindera",
     "args": {"dict_type": "ipadic" | "cc-cedict" | "ko-dic",
              "mode": "normal" | {"decompose": {...}}}}

Segmentation model (deterministic, pinned by tests/test_cjk.py goldens):

- A single compiled alternation regex scans each string left-to-right; at
  every position the FIRST matching branch wins, and branches are ordered
  longest-dictionary-entry first, so the scan is greedy maximal matching
  over the bundled lexicon (same discipline as MeCab's lattice for the
  common case, without the Viterbi costs).
- Out-of-vocabulary fallbacks, in branch order after the lexicon:
  katakana runs (loanwords are one token), hiragana runs, single Han
  characters (unigram — keeps recall: any dictionary word is still
  reachable as a phrase of its characters), Hangul syllable runs, and
  non-CJK word runs (latin/digits, same class as the `simple` tokenizer).
- `decompose` mode re-segments Han lexicon matches longer than
  `kanji_penalty_length_threshold` (default 2) into shorter lexicon words
  when they tile the compound exactly (関西国際空港 → 関西/国際/空港),
  mirroring Lindera's decompose mode for compounds
  (lindera.rs:35-47 test config).

The hot path is one pandas ``str.findall`` + explode — the scan loop lives
in the C regex engine, not per-row Python.

Round 5 adds a JAPANESE OOV MORPHOLOGY LAYER: an OOV Han(+hiragana)
chunk branch whose trailing closed-class aux/particle pieces peel off
longest-first (_ja_split) — 書いた → 書い|た, 住んでいます →
住ん|で|い|ます, 勉強しました → 勉強|し|まし|た — without those verbs in
any lexicon. This is grammar (ipadic's closed aux classes), not content
vocabulary.

Measured fidelity vs MeCab/ipadic segmentations (tools/cjk_fidelity.py;
ADVICE r4 made the eval protocol honest):
- IN-VOCABULARY (tests/data/cjk_lindera_golden.tsv — the reference
  repo's lindera.rs test sentence, Lindera README examples, MeCab
  demos; their vocabulary informed the lexicon): macro token-F1 0.981,
  exact 11/12. The divergence is すもももももももものうち, where greedy
  maximal match picks もも before も — the documented limit of
  dictionary-light greedy segmentation vs a costed lattice.
- DEV (tests/data/cjk_lindera_heldout.tsv, 40 everyday sentences; was
  held-out, measured 0.661 against the r4 segmenter, then used to
  develop the morphology layer): 0.969, exact 36/40.
- HELD-OUT (tests/data/cjk_lindera_heldout2.tsv, 40 blind sentences
  written AFTER the layer froze, measured once): **macro token-F1
  0.850, exact 21/40** — the honest generalization number. Residual
  misses are chunk-greediness over hiragana runs containing particles
  (星がきれいに…) and OOV compound aux chains (てしまった) — lattice/
  dictionary territory, documented as the method's ceiling.
"""

from __future__ import annotations

import json
import re

import numpy as np
import pandas as pd

# --------------------------------------------------------------- lexicons
# Small curated common-word lexicons (public vocabulary). Enough to make
# everyday text segment into words; everything else falls back to the
# documented OOV classes above.

_JA_WORDS = """
日本語 形態素 解析 関西国際空港 関西 国際 空港 東京大学 東京 大阪
京都 名古屋 北海道 沖縄
日本 中国 韓国 アメリカ 世界 言語 辞書 検索 索引 情報 技術 開発 研究
学校 大学 学生 先生 会社 仕事 時間 今日 明日 昨日 今年 去年 毎日
天気 電車 新幹線 飛行機 駅 電話 映画 音楽 料理 寿司 写真 新聞 雑誌
図書館 病院 銀行 公園 部屋 家族 友達 子供 名前 問題 質問 答え 意味
文化 歴史 科学 自然 環境 経済 政治 政府 社会 文字 文章 単語 文法
行う 行く 来る 見る 食べる 飲む 読む 書く 話す 聞く 買う 売る 作る
使う 思う 知る 分かる 出来る 遊ぶ 働く 住む 帰る 待つ 持つ 取る
し する ます まし ませ です でし でき できる あり おり
ない なかっ たかっ たい たく こと もの ところ これ それ あれ この その
どの ここ そこ どこ 私 僕 彼女 彼 誰 何 いつ なぜ どう とても
ください ありがとう こんにちは さようなら おはよう
すもも もも うち 猫 好き ペン いい おいしい 行き 飲み 読み 見 まし た たい
水 本 最寄り駅 スカイツリー とうきょう 吾輩 ある いる なる 限定
の は を に が と で も へ や から まで より ね よ か な さ
""".split()

# Closed-class auxiliary/particle SUFFIX pieces for the OOV verb-chunk
# splitter below — each piece is one ipadic token (助動詞/助詞/非自立
# surface forms). This is grammar (a closed class), not content
# vocabulary; longest-first so まし wins over し, たかっ over た.
_JA_AUX = sorted(
    """ください ながら ましょ たかっ なかっ
       まし ませ ます です でし たい たく ない する いる
       から まで より
       た て で し い う ん か が を は に の と も へ や ね よ ば
       き だ""".split(),
    key=len, reverse=True,
)
# Stem-final kana that end an ipadic verb/adjective token when they sit
# DIRECTLY after the Han stem: the 連用/て-form continuatives (i-row,
# e-row minus て/で which are themselves aux), the geminate っ (買っ),
# and the 撥音便 ん (住ん, 読ん). て/で excluded: 出て → 出|て.
_JA_STEM_STOP = set("きぎしじちにひびぴみりいけげせぜねべぺめれえっん")

_ZH_WORDS = """
中国 北京 上海 广州 深圳 香港 台湾 美国 日本 韩国 世界 国家 政府
我们 你们 他们 她们 自己 大家 今天 明天 昨天 现在 时间 时候 已经
学校 大学 学生 老师 同学 朋友 家庭 孩子 父母 工作 公司 经理 员工
信息 技术 开发 研究 搜索 引擎 语言 分词 词典 汉语 中文 英语 文字
电脑 计算机 手机 电话 电影 音乐 新闻 报纸 图书馆 医院 银行 公园
城市 农村 经济 文化 历史 科学 自然 环境 问题 方法 系统 数据 分析
可以 不是 没有 什么 怎么 为什么 因为 所以 但是 如果 虽然 然后
喜欢 知道 觉得 认为 希望 需要 应该 开始 结束 学习 使用 提供 进行
的 了 在 是 我 你 他 她 它 和 与 或 都 很 不 也 就 还 又 被 把
""".split()

_KO_WORDS = """
한국 서울 부산 대한민국 북한 중국 일본 미국 세계 국가 정부 사회
우리 당신 그들 오늘 내일 어제 지금 시간 학교 대학 학생 선생님
친구 가족 아이 부모 회사 직장 정보 기술 개발 연구 검색 엔진 언어
사전 한국어 형태소 분석 컴퓨터 전화 영화 음악 신문 도서관 병원
은행 공원 도시 경제 문화 역사 과학 자연 환경 문제 방법 시스템
데이터 있다 없다 하다 되다 가다 오다 보다 먹다 마시다 읽다 쓰다
말하다 듣다 사다 팔다 만들다 사용 좋아 알다 모르다 생각 희망
합니다 입니다 습니다 했다 하는 하고 해서 하면
""".split()

_LEXICONS = {
    "ipadic": _JA_WORDS,
    "unidic": _JA_WORDS,
    "cc-cedict": _ZH_WORDS,
    "ko-dic": _KO_WORDS,
}

# OOV fallback classes, applied after the lexicon branches (order matters).
# Hiragana falls back per-CHARACTER so an unknown run can't swallow the
# lexicon particles that follow it (ぴょこのです → ぴ ょ こ の です);
# katakana runs stay whole (loanwords are one token).
_KATAKANA = r"[゠-ヿㇰ-ㇿー]+"
_HIRAGANA = r"[぀-ゟ]"
_HAN_ONE = r"[㐀-䶿一-鿿豈-﫿々]"
_HANGUL = r"[가-힯ᄀ-ᇿ]+"
_WORD = (r"[^\W_　-〿぀-ゟ゠-ヿㇰ-ㇿ"
         r"㐀-䶿一-鿿가-힯ᄀ-ᇿ"
         r"豈-﫿]+")
_HAN_CHAR_RE = re.compile(r"^(?:%s)+$" % _HAN_ONE)
# Japanese OOV verb/noun chunk: a Han run plus any trailing hiragana,
# captured whole so the suffix splitter can peel closed-class aux pieces
# off the end (書いた → 書い|た without 書く in the lexicon). Japanese
# dictionaries only — for cc-cedict this branch would fuse whole
# OOV Han sentences into one token.
_JA_DICTS = ("ipadic", "unidic")
_JA_CHUNK = r"(?:%s)+(?:%s)*" % (_HAN_ONE, _HIRAGANA)
_HAN_RUN_RE = re.compile(r"(?:%s)+" % _HAN_ONE)

_PATTERN_CACHE: dict[str, re.Pattern] = {}
_DECOMP_CACHE: dict[tuple[str, int], dict] = {}
_LEXSET_CACHE: dict[str, frozenset] = {}


def _pattern(dict_type: str) -> re.Pattern:
    pat = _PATTERN_CACHE.get(dict_type)
    if pat is None:
        words = _LEXICONS[dict_type]
        alts = [re.escape(w) for w in
                sorted(set(words), key=lambda w: (-len(w), w))]
        if dict_type in _JA_DICTS:
            alts.append(_JA_CHUNK)
        alts += [_KATAKANA, _HIRAGANA, _HAN_ONE, _HANGUL, _WORD]
        pat = re.compile("|".join(alts))
        _PATTERN_CACHE[dict_type] = pat
    return pat


def _lexset(dict_type: str) -> frozenset:
    s = _LEXSET_CACHE.get(dict_type)
    if s is None:
        s = frozenset(_LEXICONS[dict_type])
        _LEXSET_CACHE[dict_type] = s
    return s


from functools import lru_cache  # noqa: E402


def _ja_han_tile(s: str, dict_type: str) -> list[str]:
    """Pure-Han OOV residue: greedy longest lexicon match at each
    position (the chunk regex can't see a lexicon word INSIDE a longer
    Han run — 毎朝新聞 → 毎朝|新聞); non-lexicon gaps of exactly 2 chars
    are one unknown noun (ipadic char.def KANJI length-2 unknowns:
    手紙, 英語), other gaps per-character (鑫森淼 → 鑫|森|淼)."""
    lex = _lexset(dict_type)
    out: list[str] = []
    gap = ""

    def flush():
        nonlocal gap
        if gap:
            out.extend([gap] if len(gap) == 2 else list(gap))
            gap = ""

    i, n = 0, len(s)
    while i < n:
        for j in range(n, i, -1):
            w = s[i:j]
            if w in lex:
                flush()
                out.append(w)
                i = j
                break
        else:
            gap += s[i]
            i += 1
    flush()
    return out


@lru_cache(maxsize=65536)
def _ja_split(tok: str, dict_type: str = "ipadic") -> tuple[str, ...]:
    """ipadic-style pieces for an OOV Han(+hiragana) chunk.

    Closed-class aux suffixes peel off the end (longest-first, each one
    an ipadic token) until the stem stops: a single continuative kana
    directly after the Han run (_JA_STEM_STOP — 書い, 食べ, 買っ, 住ん)
    stays attached, mirroring ipadic's stem+ending split (働い|て|い|ます).
    A pure-Han residue of exactly 2 chars is one unknown noun (ipadic
    char.def KANJI length-2 unknowns: 手紙, 英語); other pure-Han runs
    fall back per-character (keeps 鑫森淼 → 鑫|森|淼 recall). A サ変 stem
    (2+ Han + し) splits into noun + し (勉強し → 勉強|し), while single-
    Han 五段 stems keep し (話し)."""
    m = _HAN_RUN_RE.match(tok)
    han_end = m.end()
    suffixes: list[str] = []
    s = tok
    while len(s) > han_end:
        if len(s) == han_end + 1 and s[-1] in _JA_STEM_STOP:
            break  # Han + one continuative kana = the stem
        for a in _JA_AUX:
            if s.endswith(a) and len(s) - len(a) >= han_end:
                if a == "い" and s.endswith("しい"):
                    continue  # 〜しい adjectives (難しい) keep their い
                suffixes.append(a)
                s = s[: -len(a)]
                break
        else:
            break
    if len(s) == han_end:  # pure-Han residue
        stem = _ja_han_tile(s, dict_type)
    elif len(s) == han_end + 1 and s[-1] == "し" and han_end >= 2:
        stem = [s[:-1], "し"]  # サ変: 勉強し → 勉強|し
    else:
        stem = [s]
    return tuple(stem + suffixes[::-1])


def _decompose_table(dict_type: str, threshold: int) -> dict[str, list[str]]:
    """token → parts, for Han lexicon words longer than the threshold that
    tile exactly into shorter lexicon words (greedy longest-first)."""
    key = (dict_type, threshold)
    table = _DECOMP_CACHE.get(key)
    if table is not None:
        return table
    words = set(_LEXICONS[dict_type])
    by_len = sorted(words, key=len, reverse=True)
    table = {}
    for w in by_len:
        if len(w) <= threshold or not _HAN_CHAR_RE.match(w):
            continue
        parts, i = [], 0
        while i < len(w):
            for j in range(len(w), i, -1):
                seg = w[i:j]
                if seg != w and seg in words:
                    parts.append(seg)
                    i = j
                    break
            else:
                parts = None
                break
        if parts and len(parts) >= 2:
            table[w] = parts
    _DECOMP_CACHE[key] = table
    return table


def _parse_mode(mode) -> tuple[bool, int]:
    """Accept the reference's mode surface: 'normal' | 'decompose' |
    {'decompose': {...penalties...}} (also as a JSON string, which is how
    nested args survive the frozen Analyzer dataclass)."""
    if isinstance(mode, str) and mode.startswith("{"):
        mode = json.loads(mode)
    if mode in (None, "normal"):
        return False, 0
    if mode == "decompose":
        return True, 2
    if isinstance(mode, dict) and "decompose" in mode:
        params = mode["decompose"] or {}
        return True, int(params.get("kanji_penalty_length_threshold", 2))
    raise ValueError(f"lindera: unsupported mode {mode!r}")


def tokenize_lindera(
    s: pd.Series,
    dict_type: str = "ipadic",
    mode="normal",
    offsets: bool = False,
) -> pd.DataFrame:
    if dict_type not in _LEXICONS:
        raise ValueError(
            f"lindera: unknown dict_type {dict_type!r} "
            f"(expected one of {sorted(_LEXICONS)})"
        )
    decompose, threshold = _parse_mode(mode)
    pat = _pattern(dict_type)
    s = s.fillna("").astype(str).reset_index(drop=True)
    if len(s) == 0:
        from bayard_spark.analysis.tokenizers import _empty_frame

        return _empty_frame(offsets)
    if offsets:
        return _offsets_path(s, pat, decompose, threshold, dict_type)
    ex = s.str.findall(pat).explode().dropna()
    frame = pd.DataFrame({"idx": ex.index.to_numpy(dtype="int64"),
                          "token": ex.to_numpy()})
    pieces_of = _pieces_fn(dict_type, decompose, threshold)
    if pieces_of is not None:
        mapped = frame["token"].map(pieces_of)
        hit = mapped.notna()
        if hit.any():
            frame = frame.assign(
                token=mapped.where(hit, frame["token"].map(lambda t: [t]))
            ).explode("token", ignore_index=True)
    frame["pos"] = frame.groupby("idx").cumcount()
    return frame.reset_index(drop=True)


def _pieces_fn(dict_type: str, decompose: bool, threshold: int):
    """token → list-of-pieces (or None = keep whole), combining the
    decompose table (lexicon Han compounds) with the ja OOV chunk
    splitter. Pieces always concatenate back to the token, so the
    offsets path can walk them with a running char cursor."""
    table = _decompose_table(dict_type, threshold) if decompose else {}
    ja = dict_type in _JA_DICTS
    if not table and not ja:
        return None
    lex = _lexset(dict_type)

    def pieces(tok: str):
        got = table.get(tok)
        if got is not None:
            return got
        if ja and tok not in lex and _HAN_RUN_RE.match(tok):
            out = _ja_split(tok, dict_type)
            if len(out) > 1:
                return list(out)
        return None

    return pieces


def _offsets_path(s, pat, decompose, threshold, dict_type):
    pieces_of = _pieces_fn(dict_type, decompose, threshold)
    rows, toks, poss, starts, ends = [], [], [], [], []
    for i, text in enumerate(s):
        # byte offset of char j = cum[j], built in ONE vectorized pass per
        # string (utf-8 width from the code point) — the old
        # len(text[:a].encode()) re-encoded the prefix per TOKEN, i.e.
        # quadratic per string (ADVICE r3)
        cps = np.frombuffer(
            text.encode("utf-32-le"), dtype=np.uint32
        ).astype(np.int64)
        widths = (
            1 + (cps > 0x7F).astype(np.int64)
            + (cps > 0x7FF).astype(np.int64)
            + (cps > 0xFFFF).astype(np.int64)
        )
        cum = np.concatenate(([0], np.cumsum(widths)))
        pos = 0
        for m in pat.finditer(text):
            pieces = (
                pieces_of(m.group()) if pieces_of is not None else None
            ) or [m.group()]
            a = m.start()
            for p in pieces:
                start_b = int(cum[a])
                end_b = int(cum[a + len(p)])
                rows.append(i)
                toks.append(p)
                poss.append(pos)
                starts.append(start_b)
                ends.append(end_b)
                pos += 1
                a += len(p)
    return pd.DataFrame(
        {"idx": pd.Series(rows, dtype="int64"),
         "token": pd.Series(toks, dtype="object"),
         "pos": pd.Series(poss, dtype="int64"),
         "start": pd.Series(starts, dtype="int64"),
         "end": pd.Series(ends, dtype="int64")}
    )
