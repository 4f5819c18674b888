#!/usr/bin/env python3
"""Fuzz goldens: run the reference clean_corpus and CPython difflib on
seeded random inputs spanning the rule space; the Scala ports must match
byte-for-byte. Regenerate: python3 tools/gen_fuzz_goldens.py"""
import json, os, random, importlib.util
from difflib import SequenceMatcher

OUT = os.path.join(os.path.dirname(__file__), "..", "src/test/resources/goldens")
os.chdir("/tmp")
spec = importlib.util.spec_from_file_location(
    "jsc", "/root/reference/fda_rag_extraction/scripts/json_split_and_clean.py")
jsc = importlib.util.module_from_spec(spec)
spec.loader.exec_module(jsc)

rnd = random.Random(20260812)

FRAGMENTS = [
    lambda: " ".join(rnd.choice(["alpha","beta","gamma","delta","mg","kg","daily"])
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
    lambda: f"Take {rnd.randint(1,500)} mg orally once daily.",
    lambda: f"Less than {rnd.randint(10,100)} kg: reduce the dose.",
    # unicode \s / \d dosage shapes: CPython's re matches NBSP between
    # digit and unit and non-ASCII decimal digits (category Nd) — the
    # r13 PyWs/PyD parity fix; these rescue cutoffs exactly like ASCII
    lambda: f"Take {rnd.randint(1,500)}\u00a0mg daily.",
    lambda: f"Dose: {rnd.randint(1,99)}\u2009kg threshold.",
    lambda: "Give \u0661\u0662 mg with food.",   # Arabic-Indic digits
    lambda: "Maximum \uff14\uff12 mg daily.",    # fullwidth digits
    lambda: "Limit \u06f3\u06f0\x1ckg strictly.",  # ext-Arabic digits + FS (Python \s)
    lambda: "Full prescribing information for\u00a0DRUGX online.",
    lambda: "Dosing schedule:",
    lambda: "heading with colon:",
    lambda: "",
    lambda: "   ",
    lambda: "line – with — unicode − marks ‘quoted’ “here”",
    lambda: "multiple   spaces    between     words",
    lambda: "\t tab  padded \t",
]

cases = []
for _ in range(250):
    n = rnd.randint(1, 40)
    doc = "\n".join(FRAGMENTS[rnd.randrange(len(FRAGMENTS))]() for _ in range(n))
    cases.append({"input": doc, "expected": jsc.clean_corpus(doc)})
json.dump(cases, open(f"{OUT}/clean_corpus_fuzz.json", "w"), ensure_ascii=False)

ALPH = "abcdef"
pairs = []
for _ in range(300):
    la = rnd.randint(0, 30)
    lb = rnd.randint(0, 30)
    a = "".join(rnd.choice(ALPH) for _ in range(la))
    b = "".join(rnd.choice(ALPH) for _ in range(lb))
    pairs.append((a, b))
# autojunk regime: |b| >= 200 with popular chars
for _ in range(40):
    a = "".join(rnd.choice("ab") for _ in range(rnd.randint(150, 260)))
    b = "".join(rnd.choice("ab") for _ in range(rnd.randint(200, 260)))
    pairs.append((a, b))
# near-identical long pairs
for _ in range(20):
    a = "".join(rnd.choice(ALPH) for _ in range(rnd.randint(180, 240)))
    lst = list(a)
    for _ in range(rnd.randint(1, 4)):
        lst[rnd.randrange(len(lst))] = rnd.choice(ALPH)
    pairs.append((a, "".join(lst)))
# MIXED popular/rare autojunk regime (|b| >= 200): most chars popular
# (dropped from b2j) with rare sprinkles kept in the index — the regime
# where match extensions must pass THROUGH popular chars (CPython's
# bjunk is empty under isjunk=None). Homogeneous alphabets can't catch
# a junk-gated extension bug; these can.
def mixed(n):
    out = []
    for _ in range(n):
        r = rnd.random()
        if r < 0.45: out.append("a")
        elif r < 0.90: out.append("b")
        else: out.append(rnd.choice("XYZQW"))
    return "".join(out)
for _ in range(40):
    a = mixed(rnd.randint(150, 280))
    b = mixed(rnd.randint(200, 280))
    pairs.append((a, b))
# near-identical mixed long pairs: extensions cross popular<->rare
# boundaries repeatedly around the few edits
for _ in range(20):
    a = mixed(rnd.randint(200, 300))
    lst = list(a)
    for _ in range(rnd.randint(1, 5)):
        lst[rnd.randrange(len(lst))] = rnd.choice("abXYZ")
    pairs.append((a, "".join(lst)))
sims = [{"a": a, "b": b, "ratio": SequenceMatcher(None, a, b).ratio()} for a, b in pairs]
json.dump(sims, open(f"{OUT}/similarity_fuzz.json", "w"), ensure_ascii=False)
print("clean_corpus_fuzz:", len(cases), "similarity_fuzz:", len(sims))
