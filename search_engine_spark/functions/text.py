"""Text normalization / tokenization.

Reproduces the reference tokenizer's stage ORDER and quirks
(/root/reference/backend/utils/tokenizer.py:26-35):

    1. URL removal            (tokenizer.py:43-45, regex https?://\\S+|www\\.\\S+)
    2. contraction expansion  (tokenizer.py:55-56)
    3. punctuation -> SPACE   (tokenizer.py:47-48; note the cleaner deletes
       punctuation instead — cleaner.py:14-16 — both variants provided)
    4. stopword removal BEFORE lowercasing (tokenizer.py:27-31 call order;
       case-sensitive: "The" survives this stage, "the" does not)
    5. lowercase              (tokenizer.py:31)
    6. lemmatize non-NOUN tokens (tokenizer.py:33-34, spaCy). spaCy is not
       available in this environment; the gated fallback is a VENDORED
       deterministic table+suffix-rule lemmatizer (see _IRREGULAR_LEMMAS
       block comment) shared verbatim by the oracle and the Spark engine —
       one exactly-reproducible definition, golden-tested in
       tests/test_tokenizer.py.

Two implementations are provided and property-tested against each other
(tests/test_tokenizer.py):

* ``normalize_text`` — pure-Python, per-string. Used by the single-node
  oracle (search_engine_spark/oracle/engine.py).
* ``normalize_series`` — the batch form used inside the Spark pandas UDF.
  The input_hint's "no per-row Python" contract is about the SPARK
  boundary (Arrow-batched pandas UDFs, never BatchEvalPython row-at-a-time
  UDFs) and that boundary is unchanged; within the Arrow batch,
  ``pd.Series.str.replace(regex)`` was always a per-row C loop over the
  same ``re`` engine, so the fused single pass per row is the same
  machinery minus seven redundant full passes (measured 2.8 → 1.85 s /
  20k docs).

HTML extraction (for the ``pages.html`` binary column) is ``extract_text`` /
``extract_series``: tag strip + whitespace normalization. The per-row
invariant (BASELINE.json input_hint) is byte-identical extracted text per
url between the Spark UDF and the single-node oracle — asserted in
tests/test_index_parity.py. (It is NOT equal to the synthetic ``text``
column: the generated html wraps a ``<title>t{i}</title>`` whose text
survives tag-stripping by design, exercising real html->text divergence.)
"""

from __future__ import annotations

import re
import string

import pandas as pd

# NLTK English stopword list (public domain word list; the reference loads it
# via nltk.corpus.stopwords.words("english") — tokenizer.py:20).
STOPWORDS_LIST = [
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you",
    "you're", "you've", "you'll", "you'd", "your", "yours", "yourself",
    "yourselves", "he", "him", "his", "himself", "she", "she's", "her",
    "hers", "herself", "it", "it's", "its", "itself", "they", "them",
    "their", "theirs", "themselves", "what", "which", "who", "whom",
    "this", "that", "that'll", "these", "those", "am", "is", "are", "was",
    "were", "be", "been", "being", "have", "has", "had", "having", "do",
    "does", "did", "doing", "a", "an", "the", "and", "but", "if", "or",
    "because", "as", "until", "while", "of", "at", "by", "for", "with",
    "about", "against", "between", "into", "through", "during", "before",
    "after", "above", "below", "to", "from", "up", "down", "in", "out",
    "on", "off", "over", "under", "again", "further", "then", "once",
    "here", "there", "when", "where", "why", "how", "all", "any", "both",
    "each", "few", "more", "most", "other", "some", "such", "no", "nor",
    "not", "only", "own", "same", "so", "than", "too", "very", "s", "t",
    "can", "will", "just", "don", "don't", "should", "should've", "now",
    "d", "ll", "m", "o", "re", "ve", "y", "ain", "aren", "aren't",
    "couldn", "couldn't", "didn", "didn't", "doesn", "doesn't", "hadn",
    "hadn't", "hasn", "hasn't", "haven", "haven't", "isn", "isn't", "ma",
    "mightn", "mightn't", "mustn", "mustn't", "needn", "needn't", "shan",
    "shan't", "shouldn", "shouldn't", "wasn", "wasn't", "weren", "weren't",
    "won", "won't", "wouldn", "wouldn't",
]
STOPWORDS = frozenset(STOPWORDS_LIST)

# Common English contractions (the reference uses the `contractions` package,
# tokenizer.py:55-56; this is a deterministic fixed subset covering the
# synthetic corpus + common web text). Longest-key-first matching.
_CONTRACTIONS_BASE = {
    "can't": "cannot", "won't": "will not", "don't": "do not",
    "doesn't": "does not", "didn't": "did not", "isn't": "is not",
    "aren't": "are not", "wasn't": "was not", "weren't": "were not",
    "hasn't": "has not", "haven't": "have not", "hadn't": "had not",
    "shouldn't": "should not", "wouldn't": "would not",
    "couldn't": "could not", "mustn't": "must not", "needn't": "need not",
    "shan't": "shall not", "mightn't": "might not", "ain't": "is not",
    "i'm": "i am", "i've": "i have", "i'll": "i will", "i'd": "i would",
    "you're": "you are", "you've": "you have", "you'll": "you will",
    "you'd": "you would", "he's": "he is", "he'll": "he will",
    "he'd": "he would", "she's": "she is", "she'll": "she will",
    "she'd": "she would", "it's": "it is", "it'll": "it will",
    "it'd": "it would", "we're": "we are", "we've": "we have",
    "we'll": "we will", "we'd": "we would", "they're": "they are",
    "they've": "they have", "they'll": "they will", "they'd": "they would",
    "that's": "that is", "that'll": "that will", "there's": "there is",
    "here's": "here is", "what's": "what is", "who's": "who is",
    "let's": "let us", "y'all": "you all", "gonna": "going to",
    "wanna": "want to", "gotta": "got to",
    # extended coverage toward the `contractions` package's inventory
    # (reference tokenizer.py:55-56): wh-forms, modal+'ve, common slang
    "that'd": "that would", "there'd": "there would",
    "there'll": "there will", "there're": "there are",
    "what're": "what are", "what've": "what have", "what'll": "what will",
    "where's": "where is", "where're": "where are", "where'd": "where did",
    "when's": "when is", "why's": "why is", "how's": "how is",
    "how'd": "how did", "how'll": "how will",
    "who're": "who are", "who've": "who have", "who'll": "who will",
    "who'd": "who would", "which's": "which is",
    "would've": "would have", "could've": "could have",
    "should've": "should have", "might've": "might have",
    "must've": "must have", "needn't've": "need not have",
    "shouldn't've": "should not have", "wouldn't've": "would not have",
    "couldn't've": "could not have", "mightn't've": "might not have",
    "daren't": "dare not", "oughtn't": "ought not", "mayn't": "may not",
    "'cause": "because", "o'clock": "of the clock", "ma'am": "madam",
    "ne'er": "never", "'tis": "it is", "'twas": "it was",
    "gimme": "give me", "lemme": "let me", "dunno": "do not know",
    "kinda": "kind of", "sorta": "sort of", "outta": "out of",
    "lotta": "lot of", "cuppa": "cup of", "gotta've": "got to have",
    "somebody's": "somebody is", "someone's": "someone is",
    "something's": "something is", "everybody's": "everybody is",
    "everyone's": "everyone is", "everything's": "everything is",
    "nobody's": "nobody is", "nothing's": "nothing is",
    # full-inventory pass (round 3): modal/aux chains ('d've, 'll've,
    # n't've), y'all compounds, to've/so've, remaining wh- and slang
    # forms — the long tail of the `contractions` package's table,
    # written out from standard English usage
    "i'd've": "i would have", "i'll've": "i will have",
    "he'd've": "he would have", "he'll've": "he will have",
    "she'd've": "she would have", "she'll've": "she will have",
    "it'd've": "it would have", "it'll've": "it will have",
    "we'd've": "we would have", "we'll've": "we will have",
    "they'd've": "they would have", "they'll've": "they will have",
    "you'd've": "you would have", "you'll've": "you will have",
    "that'd've": "that would have", "there'd've": "there would have",
    "who'd've": "who would have", "who'll've": "who will have",
    "what'll've": "what will have", "can't've": "cannot have",
    "won't've": "will not have", "hadn't've": "had not have",
    "hasn't've": "has not have", "didn't've": "did not have",
    "oughtn't've": "ought not have", "daren't've": "dare not have",
    "shan't've": "shall not have", "isn't've": "is not have",
    "y'all'd": "you all would", "y'all'd've": "you all would have",
    "y'all're": "you all are", "y'all've": "you all have",
    "y'all'll": "you all will",
    "so've": "so have", "so's": "so is", "to've": "to have",
    "when've": "when have", "where've": "where have",
    "why've": "why have", "why'd": "why did", "why're": "why are",
    "how've": "how have", "how're": "how are",
    "what'd": "what did", "when'd": "when did", "where'll": "where will",
    "this's": "this is", "those're": "those are", "these're": "these are",
    "that're": "that are",
    "sha'n't": "shall not", "shalln't": "shall not",
    "amn't": "am not", "'twere": "it were", "'tisn't": "it is not",
    "e'er": "ever", "o'er": "over", "'em": "them", "'til": "until",
    "ol'": "old", "finna": "fixing to", "imma": "i am going to",
    "innit": "is it not", "gon't": "go not", "howdy": "how do you do",
    "cap'n": "captain", "c'mon": "come on", "g'day": "good day",
    "ev'ry": "every", "d'you": "do you", "d'ye": "do you",
    "whatcha": "what are you", "betcha": "bet you", "gotcha": "got you",
    "methinks": "me thinks", "tryna": "trying to", "hafta": "have to",
    "oughta": "ought to", "woulda": "would have", "coulda": "could have",
    "shoulda": "should have", "musta": "must have", "mighta": "might have",
    "helluva": "hell of a", "boutta": "about to", "'bout": "about",
    "'round": "around", "'fore": "before", "'neath": "beneath",
}


def _contraction_variants(d: dict[str, str]) -> dict[str, str]:
    """Case + curly-apostrophe variants. setdefault so a variant key that
    COLLIDES with a base key never clobbers it: "'bout".capitalize() is
    "'bout" itself (leading apostrophe is not a letter), and letting the
    capitalized value ("About") win would leak through the case-SENSITIVE
    pre-lowercase stopword filter where the reference's "about" is
    dropped."""
    out: dict[str, str] = dict(d)
    for k, v in d.items():
        # str.capitalize() is a no-op on leading-apostrophe keys ("'bout")
        # — capitalize the first LETTER instead so "'Bout"/"’Bout" expand
        kcap = (
            k[0] + k[1:].capitalize() if k[:1] in ("'", "’") else k.capitalize()
        )
        for kk, vv in (
            (kcap, v.capitalize()),
            (k.upper(), v.upper()),
            # curly-apostrophe variants seen in web text
            (k.replace("'", "’"), v),
            (kcap.replace("'", "’"), v.capitalize()),
        ):
            out.setdefault(kk, vv)
    return out


CONTRACTIONS = _contraction_variants(_CONTRACTIONS_BASE)
# longest-first so "don't" wins over hypothetical prefixes
_CONTRACTION_KEYS = sorted(CONTRACTIONS, key=len, reverse=True)
_CONTRACTION_RE = re.compile(
    r"(?<![\w'])(" + "|".join(re.escape(k) for k in _CONTRACTION_KEYS) + r")(?![\w'])"
)

# -- run-based expansion, semantically identical to _CONTRACTION_RE.sub --
# The 925-branch alternation costs ~900 branch attempts at EVERY token
# start (no trie in CPython re) — measured ~240 µs/doc, a double-digit %
# of index-build wall. Equivalent reformulation: every key is drawn from
# [\w'’], and the boundary lookarounds are (?<![\w']) / (?![\w']), so a
# match can only start at the beginning of a maximal [\w'’] run or right
# after a curly apostrophe (the one key-character NOT in the boundary
# class), and can only end at the run end or right before a curly
# apostrophe. Scanning candidates left-to-right and preferring the
# longest key reproduces re.sub's position-then-branch-order semantics
# exactly (equal-length branches matching the same span are the same
# string). Property-tested equivalent in tests/test_tokenizer.py.
_RUN_RE = re.compile(r"[\w'’]+")
_KEY_LENGTHS = sorted({len(k) for k in CONTRACTIONS}, reverse=True)


def _expand_run(m: "re.Match[str]") -> str:
    r = m.group(0)
    hit = CONTRACTIONS.get(r)
    if hit is not None:
        return hit
    if "'" not in r and "’" not in r:
        return r  # pure word run: only a whole-run key could match
    n = len(r)
    out: list[str] = []
    i = 0  # copied-up-to position
    j = 0  # candidate start under consideration
    while j < n:
        matched = False
        if j == 0 or r[j - 1] == "’":
            for L in _KEY_LENGTHS:
                end = j + L
                if end > n or (end < n and r[end] != "’"):
                    continue
                val = CONTRACTIONS.get(r[j:end])
                if val is not None:
                    out.append(r[i:j])
                    out.append(val)
                    i = j = end
                    matched = True
                    break
        if not matched:
            p = r.find("’", j)
            if p == -1:
                break
            j = p + 1
    out.append(r[i:])
    return "".join(out)

_URL_RE = re.compile(r"https?://\S+|www\.\S+")  # tokenizer.py:44
PUNCTUATION = string.punctuation
# regex char class covering exactly string.punctuation (ASCII 33-47, 58-64,
# 91-96, 123-126) for the vectorized path
_PUNCT_CLASS = r"[!-/:-@\[-`{-~]"
_PUNCT_TABLE_SPACE = str.maketrans(PUNCTUATION, " " * len(PUNCTUATION))
_PUNCT_TABLE_DELETE = str.maketrans("", "", PUNCTUATION)
_WS_RE = re.compile(r"\s+")

try:  # spaCy lemmatization (reference tokenizer.py:24,33-34) — not in this env
    import spacy  # noqa: F401

    _HAS_SPACY = True
except Exception:  # pragma: no cover
    _HAS_SPACY = False

# ---------------------------------------------------------------------------
# Vendored rule lemmatizer (reference tokenizer.py:33-34: spaCy lemma_ for
# every token whose POS is not NOUN, surface form for NOUN). spaCy is not
# installable in this environment, so this deterministic table+suffix-rule
# lemmatizer is the gated fallback, shared VERBATIM by the Spark pipeline
# (normalize_series) and the single-node oracle (normalize_text) — engine ==
# oracle holds by construction. Approximation vs spaCy, pinned as golden
# cases in tests/test_tokenizer.py:
# - bare "-s" forms are KEPT: the lemma-vs-NOUN rule means bare plurals
#   (overwhelmingly nouns) keep their surface form in the reference; the
#   price is that 3sg verbs ("runs") also stay inflected;
# - "-ing"/"-ed" forms lemmatize via irregular table → "-ied"→y →
#   consonant undoubling → Porter-m=1 e-restoration; dictionary-less edge
#   cases are stemmer-grade ("caused"→"caus") but IDENTICAL on both
#   engines; "-eed" and vowel-less stems are left untouched;
# - digit-bearing tokens (the synthetic t<i> title tokens) never match.

_IRREGULAR_LEMMAS = {
    # auxiliaries/copulas that survive the CASE-SENSITIVE stopword stage
    # (e.g. "Was" -> lowercased "was") — spaCy lemmatizes these to be/have/do
    "was": "be", "were": "be", "is": "be", "are": "be", "am": "be",
    "been": "be", "being": "be", "has": "have", "had": "have",
    "having": "have", "does": "do", "did": "do", "done": "do", "doing": "do",
    # common irregular verbs (past/participle -> lemma)
    "went": "go", "gone": "go", "going": "go", "ran": "run", "came": "come",
    "became": "become", "made": "make", "took": "take", "taken": "take",
    "saw": "see", "seen": "see", "got": "get", "gotten": "get",
    "gave": "give", "given": "give", "found": "find", "told": "tell",
    "thought": "think", "brought": "bring", "bought": "buy",
    "caught": "catch", "taught": "teach", "built": "build", "sent": "send",
    "spent": "spend", "kept": "keep", "held": "hold", "met": "meet",
    "said": "say", "paid": "pay", "lost": "lose", "felt": "feel",
    "meant": "mean", "led": "lead", "wrote": "write", "written": "write",
    "spoke": "speak", "spoken": "speak", "broke": "break", "broken": "break",
    "chose": "choose", "chosen": "choose", "drove": "drive",
    "driven": "drive", "ate": "eat", "eaten": "eat", "fell": "fall",
    "fallen": "fall", "flew": "fly", "flown": "fly", "grew": "grow",
    "grown": "grow", "knew": "know", "known": "know", "threw": "throw",
    "thrown": "throw", "wore": "wear", "worn": "wear", "began": "begin",
    "begun": "begin", "left": "leave", "stood": "stand",
    "understood": "understand", "heard": "hear", "sold": "sell",
    "sat": "sit", "swam": "swim", "sang": "sing", "drank": "drink",
    "forgot": "forget", "forgotten": "forget", "hid": "hide",
    "hidden": "hide", "rose": "rise", "risen": "rise", "woke": "wake",
    "woken": "wake", "used": "use", "using": "use", "agreed": "agree",
    "lying": "lie", "dying": "die", "tying": "tie",
    "created": "create", "creating": "create",  # VVC tail defeats the
    # e-restore rule (Porter also yields "creat") — table-pinned
    # round-4 extension (VERDICT r3 #8 — spaCy still not installable in
    # this env, so the gap is narrowed from the PUBLIC standard English
    # irregular-verb inventory instead; identical-to-lemma forms like
    # hit/cut/put are omitted as no-ops, and the known noun-clash caveat
    # of table entries — "rose", "saw", "left" — applies to e.g. "drew",
    # "stole", "tore" the same way: the reference's spaCy would
    # disambiguate by POS, this table cannot)
    "beaten": "beat", "bent": "bend", "bound": "bind", "bit": "bite",
    "bitten": "bite", "bled": "bleed", "blew": "blow", "blown": "blow",
    "bred": "breed", "burnt": "burn", "crept": "creep", "dealt": "deal",
    "dug": "dig", "drew": "draw", "drawn": "draw", "dreamt": "dream",
    "fed": "feed", "fought": "fight", "fled": "flee", "froze": "freeze",
    "frozen": "freeze", "hung": "hang", "laid": "lay", "lent": "lend",
    "lit": "light", "rode": "ride", "ridden": "ride", "rang": "ring",
    "rung": "ring", "shook": "shake", "shaken": "shake", "shone": "shine",
    "shot": "shoot", "shrank": "shrink", "shrunk": "shrink",
    "slept": "sleep", "slid": "slide", "sped": "speed", "spun": "spin",
    "sprang": "spring", "sprung": "spring", "stole": "steal",
    "stolen": "steal", "stuck": "stick", "stung": "sting",
    "struck": "strike", "swore": "swear", "sworn": "swear",
    "swept": "sweep", "swung": "swing", "tore": "tear", "torn": "tear",
    "wept": "weep", "wound": "wind",
    # "won" -> "win" is deliberately ABSENT: "won" is in the NLTK
    # stoplist (the "won't" fragment), so the case-sensitive stopword
    # stage removes it before lemmatization could ever fire
}
_IRREGULAR_RE = re.compile(
    r"(?<!\S)("
    + "|".join(sorted(_IRREGULAR_LEMMAS, key=len, reverse=True))
    + r")(?!\S)"
)
# candidate tokens only: pure lowercase-alpha ending in ing/ed with a
# >=2-char prefix (the rule function enforces the >=3-char-stem floor) —
# the callable never fires on the vast majority of tokens, keeping the
# vectorized path cheap
_LEMMA_SUFFIX_RE = re.compile(r"(?<!\S)([a-z]{2,}(?:ing|ed))(?!\S)")
_VOWELS = "aeiou"


def _porter_m(stem: str) -> int:
    """Porter measure: number of vowel→consonant transitions ('y' treated
    as consonant — a simplification both engines share)."""
    m, prev_v = 0, False
    for ch in stem:
        v = ch in _VOWELS
        if prev_v and not v:
            m += 1
        prev_v = v
    return m


def _lemma_suffix(tok: str) -> str:
    """Deterministic -ing/-ed lemma rule (see module comment)."""
    if tok.endswith("ied"):
        return tok[:-3] + "y"  # studied -> study
    if tok.endswith("eed"):
        return tok  # agreed is in the table; succeed/indeed stay
    stem = tok[:-3] if tok.endswith("ing") else tok[:-2]
    if len(stem) < 3 or not any(c in _VOWELS for c in stem):
        return tok  # thing/string/spring keep their surface form
    if (
        len(stem) >= 4
        and stem[-1] == stem[-2]
        and stem[-1] not in _VOWELS
        and stem[-1] not in "lszf"  # calling->call, passing->pass
    ):
        return stem[:-1]  # running -> run, stopped -> stop
    if (
        _porter_m(stem) == 1
        and stem[-1] not in _VOWELS + "wxy"
        and stem[-2] in _VOWELS
        and len(stem) >= 3
        and stem[-3] not in _VOWELS
    ):
        return stem + "e"  # making -> make, hoped -> hope
    return stem  # worked -> work, wanted -> want


def _lemma_tok(tok: str) -> str:
    """One token through the vendored lemma rules: irregular-table dict
    lookup, else the -ing/-ed suffix rule when the token matches
    _LEMMA_SUFFIX_RE's candidate shape (pure ASCII lowercase alpha,
    ≥2-char prefix before the suffix). Equivalent to the two regex
    passes (property-tested against them as executable spec): a table
    REPLACEMENT never needs the second pass because every table value
    that ends in -ing/-ed is a fixpoint of _lemma_suffix (the -eed guard
    covers feed/bleed/breed/speed; vowel-less/short stems cover
    spring/swing/sting) — also asserted by the property test."""
    rep = _IRREGULAR_LEMMAS.get(tok)
    if rep is not None:
        return rep
    if (
        len(tok) >= (5 if tok.endswith("ing") else 4)
        and tok.endswith(("ing", "ed"))
        and tok.isascii()
        and tok.isalpha()
        and tok.islower()
    ):
        return _lemma_suffix(tok)
    return tok


def lemmatize_text(text: str) -> str:
    """Apply the vendored lemma rules to a lowercased space-joined token
    string (1:1 per token — token counts, positions and field boundaries
    are unchanged). Single token-map pass with dict lookup — Python's re
    has no trie, so the ~150-branch irregular ALTERNATION this replaces
    re-tried every branch at every token boundary (CLAUDE.md rule;
    measured 2×: 165 → 82 ms over 3k extracted pages, same outputs).
    The regex pair (_IRREGULAR_RE + _LEMMA_SUFFIX_RE) is retained as the
    executable spec the property test checks this against."""
    return " ".join(_lemma_tok(t) for t in text.split(" "))


def lemmatize_spec(text: str) -> str:
    """The ORIGINAL two-regex-pass definition — kept as the executable
    specification for tests only (tests/test_tokenizer.py property-tests
    lemmatize_text against it)."""
    text = _IRREGULAR_RE.sub(lambda m: _IRREGULAR_LEMMAS[m.group(1)], text)
    return _LEMMA_SUFFIX_RE.sub(lambda m: _lemma_suffix(m.group(1)), text)


def lemmatize_series(s: pd.Series) -> pd.Series:
    """lemmatize_text over a Series (same token-map pass — the per-row
    Python map beats the two pandas regex replaces 2× on real pages; see
    lemmatize_text)."""
    return s.map(lemmatize_text)


def expand_contractions(text: str) -> str:
    return _RUN_RE.sub(_expand_run, text)


def remove_urls(text: str) -> str:
    return _URL_RE.sub("", text)


def remove_punctuation(text: str, *, to_space: bool = True) -> str:
    """to_space=True is the tokenizer variant (tokenizer.py:47-48);
    to_space=False is the cleaner variant (cleaner.py:14-16)."""
    return text.translate(_PUNCT_TABLE_SPACE if to_space else _PUNCT_TABLE_DELETE)


def remove_stopwords(text: str) -> str:
    """Case-SENSITIVE whitespace-token filter (applied pre-lowercase, the
    reference quirk — tokenizer.py:27-31,50-53)."""
    return " ".join(w for w in str(text).split() if w not in STOPWORDS)


_CURLY_RE = re.compile("[“”]")  # “ ” (cleaner.py:53-55)


def clean_title(text: str) -> str:
    """The CLEANER's normalization variant (SURVEY.md §2.8 F2/F8,
    cleaner.py:14-16,53-55): curly quotes stripped, punctuation DELETED
    (not spaced), lowercased. Distinct from the tokenizer pipeline —
    kept separately for byte parity with the reference's cleaned fields."""
    text = _CURLY_RE.sub("", str(text))
    text = remove_punctuation(text, to_space=False)
    return " ".join(text.lower().split())


def clean_title_series(s: pd.Series) -> pd.Series:
    """Vectorized clean_title (pandas .str ops only)."""
    s = s.astype("string").fillna("")
    s = s.str.replace(_CURLY_RE, "", regex=True)
    s = s.str.replace(_PUNCT_CLASS, "", regex=True)
    s = s.str.lower()
    s = s.str.replace(_WS_RE, " ", regex=True).str.strip()
    return s.astype(object).fillna("")


def normalize_text(text: str) -> str:
    """Pure-Python normalization: full tokenizer pipeline minus the final
    split. Returns single-space-joined tokens. Oracle-side implementation."""
    text = remove_urls(text)
    text = expand_contractions(text)
    text = remove_punctuation(text, to_space=True)
    text = remove_stopwords(text)
    text = text.lower()
    # lemma stage: vendored rule lemmatizer (spaCy absent — see the
    # _IRREGULAR_LEMMAS block comment); 1:1 per token, no resplit needed
    text = lemmatize_text(text)
    return " ".join(text.split())


def tokenize(text: str) -> list[str]:
    n = normalize_text(text)
    return n.split(" ") if n else []


def normalize_series(s: pd.Series) -> pd.Series:
    """Batch normalization: ONE fused per-row pass through the scalar
    pipeline. The previous ``.str``-chained version was vectorization
    theater — pandas ``.str.replace(regex)`` is a per-row C loop calling
    the same ``re`` engine, so eight chained stages meant eight full
    passes over every string (plus a 180-branch stopword alternation the
    scalar path replaces with a split + set filter). Measured 2.8 s →
    1.85 s per 20k docs; equality with ``normalize_text`` holds by
    construction (same code) and stays property-tested."""
    return s.astype(object).fillna("").map(normalize_text)


_TAG_RE = re.compile(rb"<[^>]*>")


def extract_text(html: bytes) -> str:
    """HTML -> text: tag strip + whitespace normalize (deterministic; the
    per-row invariant vs the oracle is byte-identical output per url)."""
    if html is None:
        return ""
    raw = _TAG_RE.sub(b" ", bytes(html))
    return " ".join(raw.decode("utf-8", errors="replace").split())


_TITLE_RE = re.compile(rb"<title[^>]*>(.*?)</title>", re.IGNORECASE | re.DOTALL)


def extract_title(html: bytes) -> str:
    """HTML -> <title> text only (first title tag; same whitespace
    normalization as extract_text). The title is the FIRST text
    extract_text emits for these pages, so the normalized doc is
    norm(title) ++ norm(body) and the per-doc title token count is a
    field boundary — the per-field channel the reference's forward index
    records (create_forward_index.py:47-49 field_matches)."""
    if html is None:
        return ""
    m = _TITLE_RE.search(bytes(html))
    if not m:
        return ""
    raw = _TAG_RE.sub(b" ", m.group(1))
    return " ".join(raw.decode("utf-8", errors="replace").split())


_TITLE_RE_STR = re.compile(r"<title[^>]*>(.*?)</title>", re.IGNORECASE | re.DOTALL)


def extract_title_series(s: pd.Series) -> pd.Series:
    """Vectorized extract_title over a binary column."""
    dec = s.map(lambda b: b.decode("utf-8", errors="replace") if b is not None else "")
    dec = dec.astype("string")
    t = dec.str.extract(_TITLE_RE_STR, expand=False)
    t = t.fillna("")
    t = t.str.replace(_TAG_RE_STR, " ", regex=True)
    t = t.str.replace(_WS_RE, " ", regex=True).str.strip()
    return t.astype(object)


_TAG_RE_STR = re.compile(r"<[^>]*>")


def extract_series(s: pd.Series) -> pd.Series:
    """Vectorized HTML extraction over a binary column (Arrow bytes)."""
    dec = s.map(lambda b: b.decode("utf-8", errors="replace") if b is not None else "")
    dec = dec.astype("string")
    dec = dec.str.replace(_TAG_RE_STR, " ", regex=True)
    dec = dec.str.replace(_WS_RE, " ", regex=True).str.strip()
    return dec.astype(object).fillna("")


def extract_fields_series(s: pd.Series) -> tuple[pd.Series, pd.Series]:
    """(full text, title text) in ONE html decode pass — equivalent to
    (extract_series(s), extract_title_series(s)) element-wise
    (property-tested) but the bytes→str decode runs once, which matters
    in the build's hottest UDF."""
    dec = s.map(lambda b: b.decode("utf-8", errors="replace") if b is not None else "")
    dec = dec.astype("string")
    t = dec.str.extract(_TITLE_RE_STR, expand=False).fillna("")
    t = t.str.replace(_TAG_RE_STR, " ", regex=True)
    t = t.str.replace(_WS_RE, " ", regex=True).str.strip()
    body = dec.str.replace(_TAG_RE_STR, " ", regex=True)
    body = body.str.replace(_WS_RE, " ", regex=True).str.strip()
    return body.astype(object).fillna(""), t.astype(object).fillna("")
