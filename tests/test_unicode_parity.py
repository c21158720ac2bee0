"""Oracle parity on an ADVERSARIAL unicode corpus.

The generated documents table is ASCII-ish prose, so the standard parity
sweep never stresses the classic cross-engine text traps: Java regex vs
DuckDB's RE2 on unicode whitespace and word classes, md5 over non-ASCII
bytes, length() semantics on astral-plane codepoints, combining marks,
empty and whitespace-only strings, 500-char single tokens, and regex
metacharacters appearing as data. This sweep swaps in a corpus made of
exactly those and requires every text-family query to stay BIT-EXACT
against its DuckDB oracle — not merely not-crash.
"""

from __future__ import annotations

import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.test_oracle_parity import ORACLES, QUERIES, _duck, _normalize

# r16: catalog-wide sweep / historical-pin tier — excluded from the
# driver's default run (see pytest.ini); run with -m exhaustive.
pytestmark = pytest.mark.exhaustive

TEXTS = [
    "hello world plain ascii text for baseline behavior here",
    "emoji \U0001F600\U0001F389\U0001F680 inside a sentence with words",
    "中文文本没有空格的长串需要分词处理测试",
    "مرحبا بالعالم هذا نص عربي",
    "tabs\tand\nnewlines\r\nand mixed control whitespace",
    "regex (meta) [chars] {braces} .dots. *stars* +plus+ |pipe| ^caret$ \\back\\",
    "a" * 500 + " single long token then normal words follow",
    "short",
    "",
    "   ",
    "email test@example.com phone 555-123-4567 ssn 123-45-6789",
    "ümlauts über straße naïve café résumé søster",
    "combining m̀ár̂k̃s̄ stacked text",
    "\U0001D52A\U0001D51E\U0001D531\U0001D525 symbols \U00013000 "
    "hieroglyphs \U0001F3F3️‍\U0001F308 zwj",
] * 4

TEXT_FAMILY = [
    "dd_exact_hash", "dd_minhash_lsh", "dd_simhash", "tx_features",
    "dd_decontam", "tx_pii_redact", "tx_repetition", "tx_chunk",
    "tx_vocab", "tx_lm_score", "dd_passage_overlap", "pk_length_buckets",
    "dd_containment", "tx_quality_gate", "tx_entropy", "mx_curriculum",
    # round 7: first-occurrence shingle novelty shares the tokenizer +
    # shingle kernel, so it must survive the same adversarial corpus
    "tx_novelty",
    # round 9: sentence segmentation (regex terminator convention vs
    # CJK/emoji/combining marks) and the code router's regex counts
    "tx_sentences",
    "tx_code_detect",
    # round 9 wave 22/23: winnowed fingerprints, JSD and OOV share the
    # whitespace tokenizer + md5 gram hashing, so they must survive the
    # same adversarial corpus (CJK, emoji, combining marks, RTL)
    "dd_winnow",
    "tx_jsd",
    "tx_oov",
    "tx_zipf",
    # round 10: span boilerplate + snippet extraction share the
    # whitespace tokenizer (+ md5 span hashing / case-folded term
    # match); dedup weights hash raw text bytes
    "tx_boilerplate_spans",
    "rt_snippet_extract",
    "mx_dedup_weights",
    "tx_ttr",
    # round 11: substring dup spans + n-gram coverage share the
    # whitespace tokenizer and md5 gram hashing; the MMR rerank shares
    # the BM25 tokenizer AND Python-set-vs-SQL token Jaccard; the
    # release report composes card/profile/jsd/leakage over raw text
    "dd_substring_spans",
    "tx_ngram_coverage",
    "rt_mmr",
    "pf_release_report",
    # round 11 wave 42: PRF expansion + token movers share the BM25 /
    # whitespace tokenizer
    "rt_query_expansion",
    "tx_top_movers",
    # round 12: format-marker census is pure regex flags; readability
    # counts regex word/sentence/vowel runs — both must agree with
    # DuckDB's RE2 on emoji/CJK/RTL/combining-mark text
    "tx_format_markers",
    "tx_readability",
    # round 12 waves 52/54: chunk digests + the banding tuner hash RAW
    # text bytes through the whitespace tokenizer / shingle path
    "dd_chunk_dedup",
    "dd_lsh_tuner",
    # round 13: the unicode fold tier itself (translate map + ß/æ/œ
    # replaces + Unicode lower) must be BIT-EXACT across engines on the
    # adversarial corpus — this is the sweep that licenses unicode=True;
    # the release audit composes gate/dedup/banding over raw text
    "dd_norm_unicode",
    "corpus_release_audit",
    # round 13 wave 59: line census md5-hashes raw trimmed lines — the
    # split/trim/md5 path must agree on CJK/emoji/control-whitespace
    "tx_line_dedup",
    # round 13 wave 60: LTR features share the BM25 whitespace tokenizer
    "rt_ltr_features",
    # round 14: the gate sweep rides quality_score's tokenizer/regex
    # ratios; the script census IS a unicode operator (Java \p{IsX} vs
    # RE2 \p{X} script classes must classify the adversarial corpus
    # identically — this sweep is what licenses that claim)
    "tx_gate_sweep",
    "tx_script_mix",
    # round 14 wave 2: the template mask (lower + digit/whitespace
    # collapse + md5) hashes raw unicode text
    "tx_templates",
]


@pytest.fixture(scope="module")
def unicode_dir(spark, sf_dir, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("sf_unicode")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "embeddings"
    ).split():
        shutil.copy(f"{sf_dir}/{t}.parquet", str(tmp / f"{t}.parquet"))
    rows = [
        (
            i, t, ["en", "fr", "de", "es"][i % 4],
            ["news", "web", "wiki", "books"][i % 4], len(t),
        )
        for i, t in enumerate(TEXTS)
    ]
    pq.write_table(
        pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        }),
        str(tmp / "documents.parquet"),
    )
    return str(tmp)


@pytest.mark.parametrize("name", TEXT_FAMILY)
def test_text_query_oracle_exact_on_adversarial_unicode(
    name, spark, unicode_dir
):
    sdf = QUERIES[name](spark, unicode_dir)
    srows = _normalize([tuple(r) for r in sdf.collect()], sdf.columns)
    con = _duck(unicode_dir)
    cur = con.execute(ORACLES[name])
    ocols = [d[0] for d in cur.description]
    orows = _normalize(cur.fetchall(), ocols)
    assert srows == orows, (
        f"{name}: {len(srows)} spark vs {len(orows)} oracle rows; "
        f"first diff "
        f"{next(((a, b) for a, b in zip(srows, orows) if a != b), None)}"
    )
