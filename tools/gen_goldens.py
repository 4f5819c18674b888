#!/usr/bin/env python3
"""Generate golden fixtures for the non-SQL-expressible operators by running
the reference implementations (read-only import from /root/reference) and
CPython stdlib difflib on hand-built inputs. Outputs JSON into
src/test/resources/goldens/. Regenerate with: python3 tools/gen_goldens.py
"""
import sys, json, importlib.util, os
from difflib import SequenceMatcher

OUT = os.path.join(os.path.dirname(__file__), "..", "src/test/resources/goldens")
os.makedirs(OUT, exist_ok=True)


def load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


# import clean_corpus without running the module's __main__/logging side
# effects: json_split_and_clean configures logging at import; tolerate it.
os.chdir("/tmp")
jsc = load("jsc", "/root/reference/fda_rag_extraction/scripts/json_split_and_clean.py")
import ast, re as _re
_src = open("/root/reference/pdf_extraction/pdf_marker_extraction.py").read()
_tree = ast.parse(_src)
_fn = next(n for n in _tree.body if isinstance(n, ast.FunctionDef) and n.name == "extract_doi")
_ns = {"re": _re, "Optional": None.__class__}
from typing import Optional as _Opt
_ns["Optional"] = _Opt
exec(compile(ast.Module(body=[_fn], type_ignores=[]), "<doi>", "exec"), _ns)
class pme:
    extract_doi = staticmethod(_ns["extract_doi"])

# ── clean_corpus fixtures (FIXTURES.md B2 families + quirk probes) ──────
CUT = "This review was conducted under Project Orbis with international partners."
GRANT = "The application was granted priority review for this indication."
cases = [
    # 1 boilerplate-start removed; same phrase mid-line kept
    "Follow the Oncology Center of Excellence on X for updates.\nReal content here.\nPlease Follow the Oncology Center of Excellence mid-line stays.",
    # 2 plain cutoff truncates
    f"Intro line.\nEfficacy was shown.\n{CUT}\nTrailing boilerplate.\nMore trailing.",
    # 3 dosage rescue within 15 lines
    f"Intro.\n{CUT}\nSome filler.\nThe recommended dose is 120 mg orally once daily.\nAfter dosage content.",
    # 4 colon-rescue: previous kept line ends with ':'
    f"Dosing schedule:\n{GRANT}\nStill present content.",
    # 5 repeated standalone headers removed (exact, case-sensitive)
    "Recommended Dosage\nTake with water.\nEfficacy and Safety\nWorks well.\nrecommended dosage stays lowercase.",
    # 6 unicode normalization
    "En–dash em—dash minus−sign ‘single’ “double” quotes.",
    # 7 whitespace: space runs, 3+ newlines, blank-after-colon
    "Header:\n\nitem 1\n\n\n\n\nitem   2   spaced.",
    # 8 cutoff with dosage beyond 15 lines → NOT rescued
    f"Intro.\n{CUT}\n" + "\n".join(f"filler {i}" for i in range(16)) + "\n50 mg daily too late.",
    # 9 ':'-line within lookahead opens nested window rescue
    f"Intro.\n{GRANT}\nheading soon:\n" + "\n".join(f"pad {i}" for i in range(5)) + "\nLess than 50 kg: reduce dose.",
    # 10 empty input / whitespace-only
    "", "   \n  \n",
    # 11 min-length interplay: short fragment
    "tiny",
    # 12 multiple cutoffs: first real cutoff wins
    f"Keep.\n{GRANT}\nGone after grant? No wait.\n{CUT}\nAfter orbis.",
    # 13 dosage rescue where cutoff line itself kept (quirk: rescued line falls through)
    f"Intro.\nThe application was granted breakthrough designation today.\n20 mg orally twice daily.\nEnd.",
    # 14 nbsp + unicode whitespace strip parity
    "  padded line  \nnormal.",
]
# r13 PyWs/PyD parity cases: CPython's \s matches NBSP/thin-space/\x1c
# and \d matches unicode decimal digits (Nd) — each rescues a cutoff or
# fires a start-anchored remove exactly like the ASCII shape; an
# ASCII-class port diverges on every one of these.
cases += [
    f"Intro.\n{CUT}\nTake 120\u00a0mg daily.\nAfter.",
    f"Intro.\n{GRANT}\nGive \u0661\u0662 mg now.\nTail.",
    f"Intro.\n{GRANT}\nMaximum \uff14\uff12 mg daily.\nTail.",
    f"Intro.\n{CUT}\nLimit 30\x1ckg strictly.\nTail.",
    "Full prescribing information for\u00a0DRUGX is online.\nKept line.",
]
goldens = [{"input": c, "expected": jsc.clean_corpus(c)} for c in cases]
json.dump(goldens, open(f"{OUT}/clean_corpus.json", "w"), ensure_ascii=False, indent=1)

# ── similarity fixtures (difflib ratio parity, incl. autojunk ≥200) ─────
pairs = [
    ("", ""), ("abc", ""), ("abc", "abc"), ("abcd", "bcde"),
    ("Randomized Trial of Examplinib in NSCLC", "Randomised Trial of Examplinib in NSCLC"),
    ("The quick brown fox", "the quick brown fox"),
    ("alpha beta gamma", "gamma beta alpha"),
    ("a" * 250 + "xyz", "a" * 250 + "xzy"),      # autojunk territory
    ("ab" * 150, "ba" * 150),
    # mixed popular/rare autojunk: extensions must pass THROUGH the
    # popular 'a'/' ' chars (bjunk is empty under isjunk=None) while
    # b2j only indexes the rare ones
    ("a" * 120 + "XQW" + "a" * 120, "a" * 118 + "XQW" + "a" * 122),
    (("ab " * 80) + "rare token " + ("ab " * 20),
     ("ab " * 78) + "rare token " + ("ab " * 22)),
    # >=200-char title-shaped pair (the reference's verify path routinely
    # normalizes titles this long: pubmed_enrichment.py:291)
    ("efficacy and safety of examplinib plus chemotherapy versus chemotherapy alone in previously untreated advanced nonsquamous non small cell lung cancer a randomized double blind placebo controlled phase 3 trial",
     "efficacy and safety of examplinib plus chemotherapy vs chemotherapy alone in previously untreated advanced nonsquamous non-small-cell lung cancer: a randomised double blind placebo controlled phase 3 trial"),
    ("Study of pembrolizumab plus chemotherapy", "Study of pembrolizumab plus chemotherapy."),
    ("kitten", "sitting"), ("abcdefghij", "jihgfedcba"),
]
sims = [{"a": a, "b": b, "ratio": SequenceMatcher(None, a, b).ratio()} for a, b in pairs]
json.dump(sims, open(f"{OUT}/similarity.json", "w"), ensure_ascii=False, indent=1)

# ── matching-blocks fixtures (the f12 oracle's replay trace layer):
# get_matching_blocks() minus the terminal sentinel, over the ratio
# pair list plus seeded word-salad fuzz shaped like p_name values ─────
import random as _random
_rng = _random.Random(1207)
_words = ["azure", "blanched", "burnished", "chartreuse", "cornflower",
          "dark", "deep", "dim", "drab", "firebrick", "floral", "forest",
          "frosted", "ghost", "goldenrod", "honeydew", "hot", "indian"]
fuzz_pairs = []
for _ in range(60):
    n = _rng.randint(2, 6)
    base = [_rng.choice(_words) for _ in range(n)]
    mut = list(base)
    op = _rng.randrange(3)
    if op == 0 and len(mut) > 2:
        mut.pop(_rng.randrange(len(mut)))
    elif op == 1:
        mut[_rng.randrange(len(mut))] = _rng.choice(_words)
    else:
        i = _rng.randrange(len(mut))
        w = mut[i]
        mut[i] = w[:max(1, len(w) // 2)] + w[len(w) // 2:][::-1]
    fuzz_pairs.append((" ".join(base), " ".join(mut)))
# autojunk-regime block fuzz: |b| >= 200, mostly-popular chars with rare
# sprinkles, so the block search must extend through chars absent from
# b2j (CPython bjunk empty under isjunk=None). 40 structured pairs.
def _mixed(n):
    out = []
    for _ in range(n):
        r = _rng.random()
        if r < 0.44: out.append("a")
        elif r < 0.88: out.append(" ")
        else: out.append(_rng.choice("wxyzqv"))
    return "".join(out)
for _ in range(25):
    a = _mixed(_rng.randint(150, 300))
    b = _mixed(_rng.randint(200, 300))
    fuzz_pairs.append((a, b))
for _ in range(15):
    a = _mixed(_rng.randint(200, 320))
    lst = list(a)
    for _ in range(_rng.randint(1, 5)):
        lst[_rng.randrange(len(lst))] = _rng.choice("a wxyz")
    fuzz_pairs.append((a, "".join(lst)))
blocks = [
    {"a": a, "b": b,
     "blocks": [[m.a, m.b, m.size]
                for m in SequenceMatcher(None, a, b).get_matching_blocks()
                if m.size > 0]}
    for a, b in pairs + fuzz_pairs]
json.dump(blocks, open(f"{OUT}/matching_blocks.json", "w"),
          ensure_ascii=False, indent=1)

# ── autojunk-divergence goldens ─────────────────────────────────────────
# Adversarial search for pairs where a junk-gated extension (the r12 bug:
# treating autojunk 'popular' chars as junk in find_longest_match's
# extension loops) produces different blocks than CPython. The recursion
# usually recovers the same totals, so iid fuzz rarely catches it (~3.5%);
# this section searches 4000 structured long-edit pairs against a
# simulation of the buggy kernel and keeps the first 25 divergent ones as
# explicit goldens (ratio + blocks straight from CPython difflib).
def _buggy_blocks(a, b):
    la, lb = len(a), len(b)
    from collections import Counter
    cnt = Counter(b)
    junk = set()
    if lb >= 200:
        ntest = lb // 100 + 1
        junk = {c for c, n in cnt.items() if n > ntest}
    b2j = {}
    for j2, c in enumerate(b):
        if c not in junk:
            b2j.setdefault(c, []).append(j2)
    def lm(alo, ahi, blo, bhi):
        besti, bestj, bestsize = alo, blo, 0
        j2len = {}
        for i in range(alo, ahi):
            newj2len = {}
            for j3 in b2j.get(a[i], []):
                if j3 < blo: continue
                if j3 >= bhi: break
                k = newj2len[j3] = j2len.get(j3 - 1, 0) + 1
                if k > bestsize:
                    besti, bestj, bestsize = i - k + 1, j3 - k + 1, k
            j2len = newj2len
        while besti > alo and bestj > blo and b[bestj-1] not in junk and a[besti-1] == b[bestj-1]:
            besti, bestj, bestsize = besti - 1, bestj - 1, bestsize + 1
        while besti+bestsize < ahi and bestj+bestsize < bhi and b[bestj+bestsize] not in junk and a[besti+bestsize] == b[bestj+bestsize]:
            bestsize += 1
        while besti > alo and bestj > blo and b[bestj-1] in junk and a[besti-1] == b[bestj-1]:
            besti, bestj, bestsize = besti - 1, bestj - 1, bestsize + 1
        while besti+bestsize < ahi and bestj+bestsize < bhi and b[bestj+bestsize] in junk and a[besti+bestsize] == b[bestj+bestsize]:
            bestsize += 1
        return besti, bestj, bestsize
    raw = []
    stack = [(0, la, 0, lb)]
    while stack:
        alo, ahi, blo, bhi = stack.pop()
        i, j4, k = lm(alo, ahi, blo, bhi)
        if k:
            raw.append((i, j4, k))
            if alo < i and blo < j4: stack.append((alo, i, blo, j4))
            if i + k < ahi and j4 + k < bhi: stack.append((i + k, ahi, j4 + k, bhi))
    return sorted(raw)

_srch = _random.Random(99)
divergent = []
for _trial in range(4000):
    n = _srch.randint(200, 300)
    a = ''.join('ab'[_srch.random() < 0.5] if _srch.random() < 0.92
                else _srch.choice('XYZQWV') for _ in range(n))
    lst = list(a)
    for _ in range(_srch.randint(3, 15)):
        op = _srch.randrange(3)
        i = _srch.randrange(len(lst))
        if op == 0: lst[i] = _srch.choice('abXYZ')
        elif op == 1 and len(lst) > 200: lst.pop(i)
        else: lst.insert(i, _srch.choice('abXYZ'))
    b = ''.join(lst)
    true_blocks = sorted((m.a, m.b, m.size)
                         for m in SequenceMatcher(None, a, b).get_matching_blocks()
                         if m.size > 0)
    if _buggy_blocks(a, b) != true_blocks:
        sm = SequenceMatcher(None, a, b)
        divergent.append({
            "a": a, "b": b, "ratio": sm.ratio(),
            "blocks": [[m.a, m.b, m.size]
                       for m in sm.get_matching_blocks() if m.size > 0]})
        if len(divergent) >= 25:
            break
assert len(divergent) == 25, f"search found only {len(divergent)}"
json.dump(divergent, open(f"{OUT}/similarity_divergent.json", "w"),
          ensure_ascii=False, indent=1)

# ── pubmed normalize fixtures (r13 unicode-class parity): the verify
# path's normalize_text / normalize_doi / clean-title expression, run on
# unicode-rich inputs where ASCII \w/\s/\d classes diverge from CPython.
# AST-extracted like extract_doi (the module imports network deps). ────
_psrc = open("/root/reference/pdf_extraction/pubmed_enrichment.py").read()
_ptree = ast.parse(_psrc)
_pcls = next(n for n in _ptree.body
             if isinstance(n, ast.ClassDef) and n.name == "DocumentVerifier")
_pns = {"re": _re}
for _fn in _pcls.body:
    if isinstance(_fn, ast.FunctionDef) and _fn.name in ("normalize_text",
                                                         "normalize_doi"):
        _fn.decorator_list = []
        exec(compile(ast.Module(body=[_fn], type_ignores=[]), "<p>", "exec"), _pns)
def _clean_title(t):  # pubmed_enrichment.py:149 inline expression
    return _re.sub(r'[;:,]', ' ', t.strip())

_norm_inputs = [
    "  Hello, World!  ",
    "β-Blocker therapy in naïve patients: a Café—study",
    "Take 120 mg; ４２ now",
    "日本語のタイトル（試験）",
    " 　edge whitespace　 ",
    "under_score keeps-hyphen? (yes)",
    "", "   ", "٢٠٢٤ review",
    "tab\tseparatedfields",
]
_doi_inputs = [
    " https://DOI.org/10.1234/AbC.def ",
    " doi: 10.5555/XYZ ",
    "doi: 10.1/x", "10.9/plain", "DOI:10.2/y", "",
]
_title_inputs = [
    ",abc,", "  ;lead and trail:  ", "a,b;c:d", " nbsp,edges ", "",
]
pn = (
    [{"kind": "text", "input": s, "expected": _pns["normalize_text"](s)}
     for s in _norm_inputs] +
    [{"kind": "doi", "input": s, "expected": _pns["normalize_doi"](s)}
     for s in _doi_inputs] +
    [{"kind": "title", "input": s, "expected": _clean_title(s)}
     for s in _title_inputs])
json.dump(pn, open(f"{OUT}/pubmed_norm.json", "w"), ensure_ascii=False, indent=1)

# ── extract_doi fixtures ────────────────────────────────────────────────
doi_cases = [
    "Title page\ndoi: 10.1234/abc.def-12\nAuthors...",
    "No doi here at all.",
    "In the References section: 10.9999/should.be.vetoed",
    "As cited previously 10.5555/also.vetoed near the word",
    "Prefix " + "x" * 5100 + " 10.1234/beyond.window",
    "Trailing punct 10.1234/abc.def).,; end",
    "Short 10.12/ab too short digits",  # \d{4,} fails -> no match
    "Valid then vetoed 10.1111/first.ok and later bibliography mention 10.2222/second",
    "Bibliography\n10.3333/vetoed.start then far away " + "y" * 300 + " 10.4444/far.ok",
    # r13: NBSP terminates the DOI suffix under CPython's unicode \s —
    # an ASCII-\s port would absorb it and everything after
    "NBSP stop: 10.7777/abc\u00a0trailing words",
    "Fullwidth registrant 10.\uff11\uff12\uff13\uff14/wide suffix",
]
dois = [{"text": t, "doi": pme.extract_doi(t)} for t in doi_cases]
json.dump(dois, open(f"{OUT}/extract_doi.json", "w"), ensure_ascii=False, indent=1)

print("wrote", os.listdir(OUT))
