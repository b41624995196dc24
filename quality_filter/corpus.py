"""Deterministic synthetic corpus generation.

Everything the engine trains on or is tested against is synthesized here
from embedded word lists with a fixed seed — no network, no real web data.
This is the analog of the reference's committed CC-licensed test images +
hardcoded expected probabilities (/root/reference/tests/unit/test_core.py:14-18).

Two products:
  * training corpora (per-language sentences) for the langid + LM artifacts
  * the ``pages`` fixture table (url, warc_ts, html, text, lang) with a
    parallel ground-truth class per row, per FIXTURES.md §1
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import numpy as np
import pandas as pd

# --------------------------------------------------------------------------
# Embedded word lists (synthetic mini-languages with realistic stopword mass)
# --------------------------------------------------------------------------

WORDS: dict[str, list[str]] = {
    "en": (
        "the and of to in is was for on with as by at from that it he she "
        "they we you this have has not be are were or an but if then there "
        "which their more some time people word work world good new first "
        "water day year way thing man life hand part child eye woman place "
        "government company number group problem fact house point school "
        "story question business night area money city market history light "
        "power change road country street winter music garden mountain river"
    ).split(),
    "de": (
        "der die das und ist war für auf mit als von bei aus dass es er sie "
        "wir ihr nicht sein sind waren oder ein aber wenn dann dort welche "
        "ihre mehr einige zeit menschen wort arbeit welt gut neu erste wasser "
        "tag jahr weg ding mann leben hand teil kind auge frau platz regierung "
        "firma nummer gruppe problem tatsache haus punkt schule geschichte "
        "frage geschäft nacht gebiet geld stadt markt licht macht straße "
        "land winter musik garten berg fluss änderung"
    ).split(),
    "fr": (
        "le la les et de dans est était pour sur avec comme par chez que il "
        "elle nous vous ce avoir pas être sont étaient ou un mais si alors "
        "là qui leur plus quelques temps gens mot travail monde bon nouveau "
        "premier eau jour année chemin chose homme vie main partie enfant "
        "œil femme endroit gouvernement société nombre groupe problème fait "
        "maison point école histoire question affaires nuit région argent "
        "ville marché lumière pouvoir route pays rue hiver musique jardin "
        "montagne rivière changement"
    ).split(),
    "es": (
        "el la los las y de en es era para sobre con como por que él ella "
        "nosotros usted este tener no ser son eran o un pero si entonces "
        "allí cual su más algunos tiempo gente palabra trabajo mundo bueno "
        "nuevo primero agua día año camino cosa hombre vida mano parte niño "
        "ojo mujer lugar gobierno empresa número grupo problema hecho casa "
        "punto escuela historia pregunta negocio noche zona dinero ciudad "
        "mercado luz poder cambio carretera país calle invierno música "
        "jardín montaña río"
    ).split(),
    "zh": list("的一是在不了有和人这中大为上个国我以要他时来用们生到作地于出就分对成会可主发年动同工也能下过子说产种面而方后多定行学法所民得"),
}

# Per-language stopwords = the high-frequency head of each list (frozen).
STOPWORDS: dict[str, list[str]] = {
    "en": WORDS["en"][:30],
    "de": WORDS["de"][:30],
    "fr": WORDS["fr"][:30],
    "es": WORDS["es"][:30],
    "zh": WORDS["zh"][:12],
}

LANGS = tuple(sorted(WORDS))

HTML_BOILERPLATE_HEAD = (
    "<html><head><title>{title}</title>"
    "<script>var x = 1; function t() {{ return x + 41; }}</script>"
    "<style>body {{ margin: 0; color: #333; }}</style></head><body>"
    "<nav><a href='/'>home</a><a href='/about'>about</a></nav>"
    "<header><h1>{title}</h1></header>"
)
HTML_BOILERPLATE_TAIL = (
    "<footer>copyright 2025 example — all rights reserved</footer>"
    "<script>trackPage();</script></body></html>"
)


def _sentence(rnd: random.Random, lang: str, n_words: int) -> str:
    return " ".join(rnd.choices(WORDS[lang], k=n_words))


def make_training_corpus(seed: int = 7, sentences_per_lang: int = 400) -> dict[str, list[str]]:
    """Per-language sentence lists for artifact training (langid + LM)."""
    rnd = random.Random(seed)
    out: dict[str, list[str]] = {}
    for lang in LANGS:
        out[lang] = [_sentence(rnd, lang, rnd.randint(6, 18)) for _ in range(sentences_per_lang)]
    return out


# --------------------------------------------------------------------------
# pages fixture generator
# --------------------------------------------------------------------------

# Document classes and their intended pipeline outcome.
CLASSES = (
    "clean",        # keep
    "clean_pii",    # keep, text scrubbed
    "repetitive",   # drop: distinct-token ratio
    "symbol_spam",  # drop: symbol density
    "stuffing",     # drop: stopword ratio (keyword stuffing, no stopwords)
    "gibberish",    # drop: LM perplexity
    "toxic",        # drop: toxicity gate
    "short",        # drop: min length
    "near",         # near-threshold (exercises calibration; either label)
    "malformed",    # quarantine: undecodable html
)
_CLASS_WEIGHTS = (40, 8, 8, 7, 7, 8, 7, 5, 6, 4)

_PII_SNIPPETS = (
    "contact me at john.doe{i}@example.com for details",
    "call +1 555-201-{f:04d} during office hours",
    "our office line is (415) 555.0{f:03d} ext 9",
    "the server lives at 192.168.{o}.{f2} on the lan",
    "send mail to info{i}@web-site.org or visit us",
)

_GIBBERISH_CHARS = "qxzjkvwfy bgdp tr"


def _make_body(rnd: random.Random, cls: str, lang: str, tox_lexicon: tuple[str, ...]) -> str:
    if cls == "short":
        return _sentence(rnd, lang, rnd.randint(2, 6))
    n_sents = rnd.randint(4, 10)
    sents = [_sentence(rnd, lang, rnd.randint(8, 16)) for _ in range(n_sents)]
    if cls in ("clean", "malformed"):
        return ". ".join(sents) + "."
    if cls == "clean_pii":
        snippet = rnd.choice(_PII_SNIPPETS).format(
            i=rnd.randint(1, 99), f=rnd.randint(0, 9999), f2=rnd.randint(1, 254), o=rnd.randint(0, 25)
        )
        sents.insert(rnd.randint(0, len(sents) - 1), snippet)
        return ". ".join(sents) + "."
    if cls == "repetitive":
        phrase = _sentence(rnd, lang, 3)
        return " ".join([phrase] * rnd.randint(25, 40))
    if cls == "symbol_spam":
        toks = []
        for s in sents[:4]:
            for w in s.split():
                toks.append(w + rnd.choice(["$$$", "###", "@@", "**", "<<>>", "%%"]))
        return " ".join(toks)
    if cls == "stuffing":
        # content words only (tail of the vocab) — near-zero stopword mass
        tail = WORDS[lang][40:] if lang != "zh" else WORDS["en"][40:]
        return " ".join(rnd.choices(tail, k=rnd.randint(60, 120)))
    if cls == "gibberish":
        words = []
        for _ in range(rnd.randint(60, 110)):
            words.append("".join(rnd.choices(_GIBBERISH_CHARS.replace(" ", ""), k=rnd.randint(3, 11))))
        return " ".join(words)
    if cls == "toxic":
        base = ". ".join(sents) + "."
        toks = base.split()
        n_tox = max(3, len(toks) // 12)
        for _ in range(n_tox):
            toks.insert(rnd.randint(0, len(toks)), rnd.choice(list(tox_lexicon)))
        return " ".join(toks)
    if cls == "near":
        # mildly degraded prose: some symbols + a little repetition
        base = " ".join(sents[:5])
        toks = base.split()
        for _ in range(len(toks) // 14):
            toks.insert(rnd.randint(0, len(toks)), rnd.choice(["$$", "##", "@@"]))
        return " ".join(toks)
    raise ValueError(cls)


def generate_pages(
    n_rows: int,
    seed: int = 42,
    tox_lexicon: tuple[str, ...] = (
        "frakk", "grotspawn", "smegrot", "drekwad", "sleemo", "poodoo", "karkface", "blasted",
    ),
    n_hosts: int = 50,
    start: datetime = datetime(2025, 6, 1),
    days: int = 8,
) -> pd.DataFrame:
    """Deterministic ``pages`` table + ground-truth ``cls`` column.

    Columns: url STRING, warc_ts TIMESTAMP, html BINARY, text STRING,
    lang STRING (claimed, sometimes wrong), cls STRING (ground truth class,
    dropped before feeding the pipeline).  Hosts are Zipf-skewed so a few
    hot hosts exist (exercises salting, per north_rule).
    """
    rnd = random.Random(seed)
    hosts = [f"host{i:03d}.example.com" for i in range(n_hosts)]
    host_weights = [1.0 / (i + 1) for i in range(n_hosts)]

    rows = []
    for i in range(n_rows):
        cls = rnd.choices(CLASSES, weights=_CLASS_WEIGHTS, k=1)[0]
        lang = rnd.choice(LANGS) if cls in ("clean", "malformed", "near") else "en"
        if cls in ("repetitive", "stuffing"):
            lang = rnd.choice(("en", "de", "fr", "es"))
        host = rnd.choices(hosts, weights=host_weights, k=1)[0]
        url = f"https://{host}/p/{i:08d}"
        ts = start + timedelta(
            days=rnd.randrange(days), seconds=rnd.randrange(86_400)
        )
        body = _make_body(rnd, cls, lang, tox_lexicon)
        title = _sentence(rnd, lang, 3)
        paragraphs = "".join(f"<p>{p.strip()}</p>" for p in body.split(". ") if p.strip())
        html_str = HTML_BOILERPLATE_HEAD.format(title=title) + paragraphs + HTML_BOILERPLATE_TAIL

        html: bytes | None
        text: str | None = None
        if cls == "malformed":
            raw = html_str.encode("utf-8")
            cut = len(raw) // 2
            html = raw[:cut] + b"\xff\xfe\x80" + raw[cut:]
        elif rnd.random() < 0.12:
            # pre-populated text, html NULL — the in-memory-handle passthrough
            # analog (/root/reference/opennsfw2/_inference.py:31-32)
            html = None
            text = body
        else:
            html = html_str.encode("utf-8")

        # claimed lang is wrong ~15% of the time (langid must override)
        claimed = lang if rnd.random() > 0.15 else rnd.choice(LANGS)
        rows.append((url, ts, html, text, claimed, cls))

    df = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang", "cls"])
    df["warc_ts"] = pd.to_datetime(df["warc_ts"])
    return df


def pages_spark_schema():
    """Fixed explicit StructType for the pages table (input_hint shape)."""
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), True),
            T.StructField("html", T.BinaryType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
        ]
    )
