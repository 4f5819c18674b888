#!/usr/bin/env python3
"""ONE differential driver for every CPython-paritied kernel (r13 verdict
ask #4: the three r13 divergence families -- autojunk, unicode \\s\\d\\w
classes, strip order -- were each found by hand-auditing one kernel at a
time; this drives a SHARED unicode-adversarial generator through ALL of
them and regenerates the fuzz goldens in one pass).

Kernels covered (reference callable -> golden file -> Scala consumer):
  clean_corpus        -> clean_corpus_fuzz.json      CleanCorpus.clean
  clean_corpus        -> clean_corpus_casefold.json  (casefold pins: s-long/
                         Kelvin-K/Turkish dotted-dotless i in cutoff,
                         boilerplate and dosage lines, interior \\r)
  difflib ratio       -> similarity_fuzz.json        Similarity.ratio
  difflib blocks      -> matching_blocks_fuzz.json   Similarity.matchingBlocks
  normalize_text/_doi -> pubmed_norm_fuzz.json       TextOps.normalizeForCompare/
  + clean-title expr                                  normalizeDoi/cleanTitleForSearch
  _format_authors     -> authors_fuzz.json           Enrich.formatAuthors
  extract_year        -> year_fuzz.json              TextOps.extractYear
  extract_doi         -> extract_doi_fuzz.json       DoiExtract.extractDoi
  str.strip()         -> pystrip_fuzz.json           CleanCorpus.pyStrip /
                                                     TextOps.pyStrip
Regenerate: python3 tools/gen_fuzz_goldens.py
Each section owns a seeded rng stream, so adding a section never shifts
another's cases."""
import ast
import importlib.util
import json
import os
import random
import re as _re
from difflib import SequenceMatcher

OUT = os.path.join(os.path.dirname(__file__), "..", "src/test/resources/goldens")
os.chdir("/tmp")


def load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


jsc = load("jsc", "/root/reference/fda_rag_extraction/scripts/json_split_and_clean.py")


def ast_extract(path, names, classname=None):
    """Pull pure functions out of modules whose imports need network."""
    tree = ast.parse(open(path).read())
    body = tree.body
    if classname:
        body = next(n for n in body
                    if isinstance(n, ast.ClassDef) and n.name == classname).body
    ns = {"re": _re}
    from typing import List, Optional
    ns["Optional"] = Optional
    ns["List"] = List
    for fn in body:
        if isinstance(fn, ast.FunctionDef) and fn.name in names:
            fn.decorator_list = []
            exec(compile(ast.Module(body=[fn], type_ignores=[]), path, "exec"), ns)
    return ns


_pm = ast_extract("/root/reference/pdf_extraction/pubmed_enrichment.py",
                  {"normalize_text", "normalize_doi"}, "DocumentVerifier")
# _format_authors lives on a class whose name we don't rely on: walk
_au = {"re": _re}
_t = ast.parse(open("/root/reference/pdf_extraction/pubmed_enrichment.py").read())
for _n in ast.walk(_t):
    if isinstance(_n, ast.FunctionDef) and _n.name == "_format_authors":
        _n.decorator_list = []
        from typing import List as _L
        _au["List"] = _L
        exec(compile(ast.Module(body=[_n], type_ignores=[]), "<a>", "exec"), _au)
assert "_format_authors" in _au
_doi = ast_extract("/root/reference/pdf_extraction/pdf_marker_extraction.py",
                   {"extract_doi"})


def extract_year(citation):  # combine_json_to_jsonl.py:40-43 minus the
    m = _re.search(r"\((\d{4})\)", citation)  # now()-default (caller pins it)
    return m.group(1) if m else None


def clean_title(t):  # pubmed_enrichment.py:149 inline expression
    return _re.sub(r"[;:,]", " ", t.strip())


# ── the SHARED unicode-adversarial pool (explicit escapes only) ────────
NBSP = " "
THIN = " "
KELVIN = "K"    # folds to k on CPython/Java/RE2
SLONG = "ſ"     # folds to s on CPython/Java/RE2
IDOT = "İ"      # folds to i on CPython/Java, NOT RE2 (oracle shim)
IDOTLESS = "ı"  # folds to i on CPython/Java, NOT RE2 (oracle shim)
NBSP_WS = "   "
EXOTIC_WS = "        　"
CTRL_WS = "\x1c\x1d\x1e\x1f\x0b\x0c"   # Python \s includes 1C-1F
ALL_WS = " \t" + NBSP_WS + EXOTIC_WS + CTRL_WS
ND = ("٠١٢٣٤٥"        # Arabic-Indic
      "۰۱۲۳"                    # extended Arabic
      "０１２３４"              # fullwidth
      "०१२")                         # Devanagari
CASEFOLD = SLONG + KELVIN + IDOT + IDOTLESS + "ẞß"  # + SS ss
COMBINING = "̧́̈̃"
SUPP = ["\U0001F600", "\U0001D11E", "\U0001F680", "\U00020000"]  # non-BMP
DASHQ = "–—−‘’“”"
UNIWORDS = ["β-blocker", "naïve", "café",
            "日本語", "Straße",
            "ſucceſſ", "prİority", "prıorıty"]
ASCII_WORDS = ["alpha", "beta", "gamma", "delta", "mg", "kg", "daily",
               "review", "granted", "dosage", "trial", "phase"]


def adv_token(rnd):
    r = rnd.random()
    if r < 0.45:
        return rnd.choice(ASCII_WORDS)
    if r < 0.65:
        return rnd.choice(UNIWORDS)
    if r < 0.75:
        return "".join(rnd.choice(ND) for _ in range(rnd.randint(1, 4)))
    if r < 0.85:
        w = rnd.choice(ASCII_WORDS)
        i = rnd.randrange(len(w))
        return w[:i] + rnd.choice(CASEFOLD) + w[i:]
    if r < 0.95:
        return rnd.choice(ASCII_WORDS) + rnd.choice(COMBINING)
    return rnd.choice(DASHQ) + rnd.choice(ASCII_WORDS) + rnd.choice(DASHQ)


def adv_text(rnd, lo=1, hi=10, ws_p=0.25):
    parts = []
    for i in range(rnd.randint(lo, hi)):
        if i:
            parts.append(rnd.choice(ALL_WS) if rnd.random() < ws_p else " ")
        parts.append(adv_token(rnd))
    def edge():
        return "".join(rnd.choice(ALL_WS) for _ in range(rnd.randint(0, 3)))
    return edge() + "".join(parts) + edge()


# ── clean_corpus: random rule-mix docs over adversarial fragments ──────
rnd = random.Random(20260812)

FRAGMENTS = [
    lambda: " ".join(rnd.choice(["alpha", "beta", "gamma", "delta", "mg", "kg", "daily"])
                     for _ in range(rnd.randint(1, 12))),
    lambda: "The application was granted priority review for treatment.",
    lambda: "This review was conducted under Project Orbis partners.",
    lambda: "this review used the Real-Time Oncology Review pilot",
    lambda: "received breakthrough designation yesterday",
    lambda: "Recommended Dosage",
    lambda: "Efficacy and Safety",
    lambda: "Expedited Programs",
    lambda: "Follow the Oncology Center of Excellence on X for news.",
    lambda: "Full prescribing information for DRUGNAME is online.",
    lambda: "FDA: Coronavirus Disease 2019 (COVID-19) update",
    lambda: f"Take {rnd.randint(1, 500)} mg orally once daily.",
    lambda: f"Less than {rnd.randint(10, 100)} kg: reduce the dose.",
    # unicode \s / \d dosage shapes (r13 PyWs/PyD parity)
    lambda: f"Take {rnd.randint(1, 500)}{NBSP}mg daily.",
    lambda: f"Dose: {rnd.randint(1, 99)}{THIN}kg threshold.",
    lambda: "Give ١٢ mg with food.",
    lambda: "Maximum ４２ mg daily.",
    lambda: "Limit ۳۰\x1ckg strictly.",
    lambda: f"Full prescribing information for{NBSP}DRUGX online.",
    lambda: "Dosing schedule:",
    lambda: "heading with colon:",
    lambda: "",
    lambda: "   ",
    lambda: "line – with — unicode − marks "
            "‘quoted’ “here”",
    lambda: "multiple   spaces    between     words",
    lambda: "\t tab  padded \t",
    # r14: casefold + interior-\r shapes (UNIX_LINES / UNICODE_CASE parity)
    lambda: "The application was granted\rpriority review today.",
    lambda: f"The application was granted pr{IDOT}or{IDOT}ty rev{IDOT}ew now.",
    lambda: f"granted brea{KELVIN}through de{SLONG}ignation for it",
    lambda: f"Thi{SLONG} review u{SLONG}ed RTOR today.",
    lambda: f"le{SLONG}{SLONG} than ٤٠ kg threshold",
    lambda: f"Limit 30{NBSP}{KELVIN}g strictly.",
    lambda: f"FDA expedited programs are described {IDOT}n the "
            f"Gu{IDOTLESS}dance for Industry today.",
    lambda: f"Recommended Do{SLONG}age",  # NOT the exact header -- stays
    lambda: adv_text(rnd, 2, 8),
]

cases = []
for _ in range(250):
    n = rnd.randint(1, 40)
    doc = "\n".join(FRAGMENTS[rnd.randrange(len(FRAGMENTS))]() for _ in range(n))
    cases.append({"input": doc, "expected": jsc.clean_corpus(doc)})
json.dump(cases, open(f"{OUT}/clean_corpus_fuzz.json", "w"), ensure_ascii=False)

# ── casefold pins: deterministic three-engine-audited lines. CPython
# re.IGNORECASE and Java CASE_INSENSITIVE|UNICODE_CASE both simple-fold
# s-long->s, Kelvin->k, AND the Turkish pair (dotted I U+0130 / dotless
# i U+0131) -> i via CPython's EXTRA_CASES; RE2 folds the first two but
# NOT the Turkish pair, so the f1 trace oracle folds {U+0130,U+0131}->i
# in its (?i) match inputs (SparkEntry.f1TraceSql) -- these goldens pin
# the JVM==CPython side, the driver's DuckDB run proves the oracle side.
CASEFOLD_DOCS = [
    f"Keep.\nThe application was granted pr{IDOT}or{IDOT}ty rev{IDOT}ew.\nGone.",
    f"Keep.\nThe application was granted pr{IDOTLESS}or{IDOTLESS}ty "
    f"rev{IDOTLESS}ew.\nGone.",
    f"Keep.\nThi{SLONG} review u{SLONG}ed the A{SLONG}{SLONG}e{SLONG}{SLONG}ment "
    "Aid.\nGone.",
    f"Keep.\ngranted brea{KELVIN}through designation now\nGone.",
    f"Keep.\nreceived orphan drug de{SLONG}ignation\nGone.",
    # dosage rescue driven by folded chars: Kelvin kg, s-long 'less'
    "Intro.\nThe application was granted priority review.\n"
    f"Take 40{NBSP}{KELVIN}g now.\nTail.",
    "Intro.\nThe application was granted priority review.\n"
    f"le{SLONG}{SLONG} than 50 here.\nTail.",
    # boilerplate start-anchored remove with folded chars
    f"FDA expedited programs are described {IDOT}n the Guidance for "
    "Industry.\nKept.",
    f"Follow us on X{IDOTLESS} extra.\nKept.",
    # interior \r inside one line: '.' must span it (UNIX_LINES)
    "Keep.\nThe application was granted\rpriority review.\nGone.",
    "Keep.\nThis review\rused the\rAssessment Aid.\nGone.",
    # eszett stays unexpanded (no ss<->ß match on any engine)
    "Keep.\ngranted prießity review iß not a match shape.\nKept too.",
]
json.dump([{"input": c, "expected": jsc.clean_corpus(c)} for c in CASEFOLD_DOCS],
          open(f"{OUT}/clean_corpus_casefold.json", "w"), ensure_ascii=False, indent=1)

# ── similarity ratio: ASCII regimes + unicode/supplementary ────────────
srnd = random.Random(20260813)
ALPH = "abcdef"
pairs = []
for _ in range(300):
    la = srnd.randint(0, 30)
    lb = srnd.randint(0, 30)
    pairs.append(("".join(srnd.choice(ALPH) for _ in range(la)),
                  "".join(srnd.choice(ALPH) for _ in range(lb))))
for _ in range(40):  # autojunk regime: |b| >= 200 with popular chars
    pairs.append(("".join(srnd.choice("ab") for _ in range(srnd.randint(150, 260))),
                  "".join(srnd.choice("ab") for _ in range(srnd.randint(200, 260)))))
for _ in range(20):  # near-identical long pairs
    a = "".join(srnd.choice(ALPH) for _ in range(srnd.randint(180, 240)))
    lst = list(a)
    for _ in range(srnd.randint(1, 4)):
        lst[srnd.randrange(len(lst))] = srnd.choice(ALPH)
    pairs.append((a, "".join(lst)))


def mixed(rng, n):
    out = []
    for _ in range(n):
        r = rng.random()
        if r < 0.45:
            out.append("a")
        elif r < 0.90:
            out.append("b")
        else:
            out.append(rng.choice("XYZQW"))
    return "".join(out)


for _ in range(40):  # MIXED popular/rare autojunk regime (r12 bug class)
    pairs.append((mixed(srnd, srnd.randint(150, 280)),
                  mixed(srnd, srnd.randint(200, 280))))
for _ in range(20):  # near-identical mixed long pairs
    a = mixed(srnd, srnd.randint(200, 300))
    lst = list(a)
    for _ in range(srnd.randint(1, 5)):
        lst[srnd.randrange(len(lst))] = srnd.choice("abXYZ")
    pairs.append((a, "".join(lst)))
# r14: unicode word pairs (combining marks, casefold chars, CJK)
for _ in range(40):
    a = adv_text(srnd, 1, 8, ws_p=0.1)
    if srnd.random() < 0.5:
        lst = list(a)
        for _ in range(srnd.randint(1, 4)):
            lst[srnd.randrange(len(lst))] = srnd.choice("ae" + CASEFOLD)
        b = "".join(lst)
    else:
        b = adv_text(srnd, 1, 8, ws_p=0.1)
    pairs.append((a, b))
# r14: SUPPLEMENTARY-plane pairs -- difflib counts code POINTS where a
# UTF-16 port counts units; lengths, the autojunk |b|>=200 threshold and
# block indices all shift (the Similarity codepoint-path fix)
for _ in range(30):
    def mk(n):
        return "".join(srnd.choice(SUPP) if srnd.random() < 0.3
                       else srnd.choice("abc x") for _ in range(n))
    a = mk(srnd.randint(1, 40))
    b = (mk(srnd.randint(1, 40)) if srnd.random() < 0.5
         else a[:srnd.randint(0, len(a))] + mk(srnd.randint(0, 10)))
    pairs.append((a, b))
for _ in range(15):  # autojunk with a supplementary POPULAR element: the
    # 200-codepoint threshold sits at 400 UTF-16 units -- a unit-counting
    # port flips autojunk on the wrong corpora
    pop = srnd.choice(SUPP)
    def mk2(n):
        return "".join(pop if srnd.random() < 0.6
                       else srnd.choice("xyzw") for _ in range(n))
    pairs.append((mk2(srnd.randint(150, 280)), mk2(srnd.randint(195, 280))))
sims = [{"a": a, "b": b, "ratio": SequenceMatcher(None, a, b).ratio()}
        for a, b in pairs]
json.dump(sims, open(f"{OUT}/similarity_fuzz.json", "w"), ensure_ascii=False)

# ── matching blocks over the unicode/supplementary shapes (codepoint
# indices -- the Similarity.matchingBlocks contract and DuckDB's substr) ─
brnd = random.Random(20260814)
bpairs = []
for _ in range(50):
    a = adv_text(brnd, 1, 10, ws_p=0.15)
    lst = list(a)
    for _ in range(brnd.randint(0, 5)):
        if lst:
            op = brnd.randrange(3)
            i = brnd.randrange(len(lst))
            if op == 0:
                lst[i] = brnd.choice("ab" + CASEFOLD + ND)
            elif op == 1:
                lst.pop(i)
            else:
                lst.insert(i, brnd.choice(SUPP))
    bpairs.append((a, "".join(lst)))
for _ in range(30):
    def mk3(n):
        return "".join(brnd.choice(SUPP) if brnd.random() < 0.35
                       else brnd.choice("ab c") for _ in range(n))
    bpairs.append((mk3(brnd.randint(1, 60)), mk3(brnd.randint(1, 60))))
blocks = [{"a": a, "b": b,
           "blocks": [[m.a, m.b, m.size]
                      for m in SequenceMatcher(None, a, b).get_matching_blocks()
                      if m.size > 0]}
          for a, b in bpairs]
json.dump(blocks, open(f"{OUT}/matching_blocks_fuzz.json", "w"), ensure_ascii=False)

# ── pubmed normalizers over the shared generator ────────────────────────
prnd = random.Random(20260815)
pn = []
for _ in range(60):
    s = adv_text(prnd, 0, 8)
    pn.append({"kind": "text", "input": s, "expected": _pm["normalize_text"](s)})
for _ in range(50):
    core = adv_text(prnd, 1, 3, ws_p=0.1).replace(" ", ".")
    pre = prnd.choice(["", "https://doi.org/", "http://DOI.org/", "doi:",
                       "DOI: ", f"doi:{NBSP}", "doi:  ", "Doi:\t"])
    s = (prnd.choice(["", " ", NBSP, "\x1c"]) + pre + core +
         prnd.choice(["", " ", NBSP]))
    pn.append({"kind": "doi", "input": s, "expected": _pm["normalize_doi"](s)})
for _ in range(40):
    s = adv_text(prnd, 0, 6)
    for _ in range(prnd.randint(0, 4)):
        i = prnd.randint(0, len(s))
        s = s[:i] + prnd.choice(";:,") + s[i:]
    pn.append({"kind": "title", "input": s, "expected": clean_title(s)})
json.dump(pn, open(f"{OUT}/pubmed_norm_fuzz.json", "w"), ensure_ascii=False)

# ── format_authors over unicode author lists ────────────────────────────
arnd = random.Random(20260816)
NAMES = ["Smith J", "Müller K", "Želİnsky A",
         "山田 T", "O'Brien-Ås P", "Garcíá L", "Q"]
au = []
for _ in range(40):
    n = arnd.randint(0, 6)
    authors = [arnd.choice(NAMES) for _ in range(n)]
    au.append({"authors": authors, "expected": _au["_format_authors"](authors)})
json.dump(au, open(f"{OUT}/authors_fuzz.json", "w"), ensure_ascii=False, indent=1)

# ── extract_year: (\d{4}) is UNICODE Nd on CPython str ──────────────────
yrnd = random.Random(20260817)
ycases = []
YDIGS = ["2024", "1999", "٢٠٢٤",
         "２０１９", "20۲۴", "199", "20245"]
for _ in range(60):
    body = adv_text(yrnd, 1, 5)
    d = yrnd.choice(YDIGS)
    shape = yrnd.randrange(5)
    if shape == 0:
        s = f"{body} ({d}) tail"
    elif shape == 1:
        s = f"{body} （{d}） tail"         # fullwidth parens: no match
    elif shape == 2:
        s = f"({yrnd.choice(YDIGS)}) then ({d})"   # first match wins
    elif shape == 3:
        s = f"{body} ( {d} )"                      # inner spaces: no match
    else:
        s = body
    ycases.append({"input": s, "expected": extract_year(s)})
json.dump(ycases, open(f"{OUT}/year_fuzz.json", "w"), ensure_ascii=False)

# ── extract_doi: window / veto / unicode-\s suffix / Nd registrant ─────
drnd = random.Random(20260818)
dcases = []
REG = ["1234", "55555", "١٢٣٤",
       "98०१", "123"]  # 3-digit registrant fails \d{4,}
SUFF = ["abc.def-12", "x", "j.1234/extra", "ab_cd(ef", f"s{SLONG}uffix"]
TERM = [" ", NBSP, THIN, "\x1c", " ", "\n", ")", "]", '"', ";", ""]
VETO = ["reference", "cited", "bibliography", "References section",
        "as CITED previously", "Bibliography\n"]
for _ in range(90):
    reg = drnd.choice(REG)
    suf = drnd.choice(SUFF)
    doi = f"10.{reg}/{suf}" + drnd.choice(["", ".", ",;", "):", ">).,"])
    ctx = adv_text(drnd, 1, 6)
    shape = drnd.randrange(6)
    if shape == 0:
        text = f"{ctx} {doi}{drnd.choice(TERM)}tail words"
    elif shape == 1:  # veto word inside the 100-back/200-fwd window
        text = f"{ctx} {drnd.choice(VETO)} {doi}{drnd.choice(TERM)}tail"
    elif shape == 2:  # veto word far behind the match (outside window)
        text = (f"{drnd.choice(VETO)} " + "z" * drnd.randint(150, 400) +
                f" {doi} tail")
    elif shape == 3:  # vetoed first, clean second
        text = (f"cited {doi} and then " + "q" * drnd.randint(100, 250) +
                f" 10.4321/clean.{drnd.randrange(999)} end")
    elif shape == 4:  # beyond the 5000-char window
        text = "p" * drnd.randint(4900, 5200) + f" {doi} tail"
    else:  # duplicate match: str.find locates the FIRST occurrence
        text = f"{doi} filler {doi} more"
    dcases.append({"text": text, "doi": _doi["extract_doi"](text)})
json.dump(dcases, open(f"{OUT}/extract_doi_fuzz.json", "w"), ensure_ascii=False)

# ── str.strip() parity (CleanCorpus.pyStrip scalar + TextOps column) ───
strnd = random.Random(20260819)
stcases = []
for _ in range(90):
    def edge():
        # ZWSP U+200B and Mongolian U+180E are NOT whitespace to
        # Python 3 -- negative members mixed into the strip edges
        return "".join(strnd.choice(ALL_WS + "​᠎")
                       for _ in range(strnd.randint(0, 4)))
    s = edge() + adv_text(strnd, 0, 4, ws_p=0.3) + edge()
    stcases.append({"input": s, "expected": s.strip()})
json.dump(stcases, open(f"{OUT}/pystrip_fuzz.json", "w"), ensure_ascii=False)

print("unified fuzz goldens:",
      {f: len(v) for f, v in [("clean_corpus_fuzz", cases),
                              ("clean_corpus_casefold", CASEFOLD_DOCS),
                              ("similarity_fuzz", sims),
                              ("matching_blocks_fuzz", blocks),
                              ("pubmed_norm_fuzz", pn),
                              ("authors_fuzz", au),
                              ("year_fuzz", ycases),
                              ("extract_doi_fuzz", dcases),
                              ("pystrip_fuzz", stcases)]})
