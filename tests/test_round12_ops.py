"""Round-12 operator tests: char-trigram language ID, PII scrub v2,
unigram-LM tokenizer trainer, graph-ANN beam search.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


def _write_documents_ml(path: str, rows: list[tuple[int, str, str]]) -> str:
    """Crafted documents table with per-row lang labels."""
    os.makedirs(path, exist_ok=True)
    pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": [r[2] for r in rows],
            "source": "crafted",
            "n_chars": [len(r[1]) for r in rows],
        }
    ).to_parquet(f"{path}/documents.parquet")
    return path


# ---- char-trigram language ID -------------------------------------------

# Natural sentences in each model language — NOT copies of LANG_SEED
# (different word order / content words); the classifier must get them
# right through shared function-word and script trigrams.
CRAFTED_ML = [
    (0, "我们的朋友住在老人的房子里他们想看看太阳下山的时候会发生什么", "zh"),
    (1, "ともだちはいつもそこにいますなにがおこるかをみたいとおもいます", "ja"),
    (2, "친구는 항상 거기에 있습니다 무슨 일이 일어나는지 보고 싶습니다", "ko"),
    (3, "the old man and the dog want to see the sun and all of the stars", "en"),
    (4, "der alte mann und der hund wollen die sonne und die sterne sehen", "de"),
    (5, "el viejo hombre y el perro quieren ver el sol y las estrellas", "es"),
    (6, "le vieil homme et le chien veulent voir le soleil et les étoiles", "fr"),
    (7, "xq", "en"),  # < 3 chars → no trigrams → 'und'
]


def test_lang_id_crafted_multilingual(spark, tmp_path):
    """Crafted zh/ja/ko/en/de/es/fr sentences must classify correctly
    (the CJK cases are exactly what the old marker-word heuristic could
    never do on unsegmented text), and a sub-trigram doc must fall back
    to 'und'. Cross-checked row-for-row against the driver's DuckDB
    oracle on the same crafted table."""
    import __spark_entry__ as entry
    from mimir_spark.operators.textstats import lang_id

    sf = _write_documents_ml(str(tmp_path / "ml"), CRAFTED_ML)
    got = {r.doc_id: (r.pred_lang, r.is_correct) for r in lang_id(spark, sf).collect()}
    for doc_id, _text, lang in CRAFTED_ML[:7]:
        assert got[doc_id] == (lang, 1), (doc_id, lang, got[doc_id])
    assert got[7] == ("und", 0)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    duck = {
        r[0]: (r[1], r[2])
        for r in con.execute(entry.oracle_sql()["lang_id"]).fetchall()
    }
    assert got == duck


def test_lang_trigram_model_is_bounded(spark):
    """|model| must equal |langs| x |vocab| with |vocab| <= langs*TOPT
    regardless of corpus size — the broadcastability contract."""
    from mimir_spark.operators.textstats import (
        LANG_SEED,
        LANG_TOPT,
        lang_trigram_model,
    )

    m = lang_trigram_model(spark, SF_SMOKE)
    n_langs = m.select("lang").distinct().count()
    n_vocab = m.select("tg").distinct().count()
    assert n_langs == len(LANG_SEED)  # corpus langs ⊆ seed langs
    assert n_vocab <= n_langs * LANG_TOPT
    assert m.count() == n_langs * n_vocab


# ---- PII scrub v2 ---------------------------------------------------------

PII_CRAFTED = [
    (0, "contact me at jane.doe+spam@example.co.uk or 555-123-4567 today"),
    (1, "card 4111111111111111 and bad card 4111111111111112 here"),
    (2, "ssn 123-45-6789 server at 192.168.1.254 bad ip 999.999.1.1"),
    (3, "token sk_live_a8Bz93kQ7wXp2Lm5vRt1 and aaaaaaaaaaaaaaaaaaaaaaaa1"),
    (4, "dashed card 4111-1111-1111-1111 spaced 5500 0000 0000 0004"),
    (5, "nothing suspicious in this sentence at all"),
    (6, "call 555.867.5309 or visit 10.0.0.1 port list 256.1.1.1"),
]

# (n_emails, n_phones, n_ssns, n_cards, n_ips, n_keys) per doc
PII_EXPECT = {
    0: (1, 1, 0, 0, 0, 0),
    1: (0, 0, 0, 1, 0, 0),  # Luhn kills ...112
    2: (0, 0, 1, 0, 1, 0),  # octet check kills 999.x
    3: (0, 0, 0, 0, 0, 1),  # entropy kills the aaaa...1 run
    4: (0, 0, 0, 2, 0, 0),  # dashed + spaced groupings both Luhn-valid
    5: (0, 0, 0, 0, 0, 0),
    6: (0, 1, 0, 0, 1, 0),  # dot-phone; 256.1.1.1 rejected
}


def test_pii_scrub_v2_crafted(spark, tmp_path):
    """Each detector class with a crafted positive AND a near-miss
    negative (Luhn-invalid PAN, out-of-range octet, low-entropy
    24-char token), cross-checked row-for-row against the DuckDB
    oracle on the same crafted table."""
    import __spark_entry__ as entry
    from mimir_spark.operators.textstats2 import pii_scrub

    sf = _write_documents_ml(
        str(tmp_path / "pii"), [(i, t, "en") for i, t in PII_CRAFTED]
    )
    got = {
        r.doc_id: (r.n_emails, r.n_phones, r.n_ssns, r.n_cards, r.n_ips, r.n_keys)
        for r in pii_scrub(spark, sf).collect()
    }
    assert got == PII_EXPECT

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    duck = {
        r[0]: tuple(r[1:7])
        for r in con.execute(entry.oracle_sql()["pii_scrub"]).fetchall()
    }
    assert duck == PII_EXPECT
    # clean_len parity on the crafted rows too (the redaction chain)
    spark_len = {r.doc_id: r.clean_len for r in pii_scrub(spark, sf).collect()}
    duck_len = {
        r[0]: r[7]
        for r in con.execute(entry.oracle_sql()["pii_scrub"]).fetchall()
    }
    assert spark_len == duck_len
