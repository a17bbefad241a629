"""Snowball "english" (Porter2) stemmer.

Implemented from the published algorithm description at
snowballstem.org/algorithms/english/stemmer.html (public knowledge).
The reference engine uses rust-stemmers' Snowball English
(searchlite-core/src/analysis/analyzer.rs:336-343), which implements
the same algorithm, so token outputs match.
"""

from __future__ import annotations

VOWELS = set("aeiouy")

DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")

LI_ENDING = set("cdeghkmnrt")

EXCEPTIONS1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl", "sky": "sky",
    "news": "news", "howe": "howe", "atlas": "atlas", "cosmos": "cosmos",
    "bias": "bias", "andes": "andes",
}

EXCEPTIONS2 = {
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed",
}


def _is_vowel(word: str, i: int) -> bool:
    return word[i] in VOWELS


def _regions(word: str) -> tuple[int, int]:
    """R1, R2 start offsets per the Snowball definition."""
    r1 = len(word)
    # special prefixes
    for pre in ("gener", "commun", "arsen"):
        if word.startswith(pre):
            r1 = len(pre)
            break
    else:
        for i in range(1, len(word)):
            if not _is_vowel(word, i) and _is_vowel(word, i - 1):
                r1 = i + 1
                break
    r2 = len(word)
    for i in range(r1 + 1, len(word)):
        if not _is_vowel(word, i) and _is_vowel(word, i - 1):
            r2 = i + 1
            break
    return r1, r2


def _short_syllable_at_end(word: str) -> bool:
    n = len(word)
    if n == 2:
        return _is_vowel(word, 0) and not _is_vowel(word, 1)
    if n >= 3:
        c, v, c2 = word[-3], word[-2], word[-1]
        return (
            c not in VOWELS
            and v in VOWELS
            and c2 not in VOWELS
            and c2 not in "wxY"
        )
    return False


def _is_short(word: str, r1: int) -> bool:
    return r1 >= len(word) and _short_syllable_at_end(word)


def stem(word: str) -> str:
    if len(word) <= 2:
        return word
    word = word.lower()
    if word in EXCEPTIONS1:
        return EXCEPTIONS1[word]
    if word[0] == "'":
        word = word[1:]
    # mark consonant y
    if word and word[0] == "y":
        word = "Y" + word[1:]
    word = "".join(
        "Y" if c == "y" and i > 0 and word[i - 1] in VOWELS else c
        for i, c in enumerate(word)
    )
    r1, r2 = _regions(word)

    # Step 0: strip 's / 's' / '
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # Step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-3] + ("i" if len(word) > 4 else "ie")
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s"):
        if any(c in VOWELS or c == "Y" for c in word[:-2]):
            word = word[:-1]

    if word in EXCEPTIONS2:
        return word.replace("Y", "y")

    # Step 1b
    step1b_done = False
    if word.endswith("eedly"):
        if len(word) - 5 >= r1:
            word = word[:-3]
    elif word.endswith("eed"):
        if len(word) - 3 >= r1:
            word = word[:-1]
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem_part = word[: -len(suf)]
                if any(c in VOWELS or c == "Y" for c in stem_part):
                    word = stem_part
                    step1b_done = True
                break
    if step1b_done:
        if word.endswith(("at", "bl", "iz")):
            word += "e"
        elif word.endswith(DOUBLES):
            word = word[:-1]
        else:
            r1, r2 = _regions(word)
            if _is_short(word, r1):
                word += "e"
    r1, r2 = _regions(word)

    # Step 1c: y -> i
    if (
        len(word) > 2
        and word[-1] in "yY"
        and word[-2] not in VOWELS
    ):
        word = word[:-1] + "i"

    # Step 2
    STEP2 = [
        ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
        ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
        ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
        ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
        ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
        ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
        ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
        ("bli", "ble"),
    ]
    for suf, rep in STEP2:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                word = word[: -len(suf)] + rep
            break
    else:
        if word.endswith("ogi"):
            if len(word) - 3 >= r1 and word[-4] == "l":
                word = word[:-1]
        elif word.endswith("li"):
            if len(word) - 2 >= r1 and word[-3] in LI_ENDING:
                word = word[:-2]
    r1, r2 = _regions(word)

    # Step 3
    STEP3 = [
        ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
        ("icate", "ic"), ("iciti", "ic"), ("ical", "ic"),
        ("ness", ""), ("ful", ""),
    ]
    for suf, rep in STEP3:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                word = word[: -len(suf)] + rep
            break
    else:
        if word.endswith("ative") and len(word) - 5 >= r2:
            word = word[:-5]
    r1, r2 = _regions(word)

    # Step 4
    STEP4 = (
        "ement", "ance", "ence", "able", "ible", "ment",
        "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
        "al", "er", "ic",
    )
    for suf in STEP4:
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                word = word[: -len(suf)]
            break
    else:
        if word.endswith("ion") and len(word) - 3 >= r2 and word[-4] in "st":
            word = word[:-3]
    r1, r2 = _regions(word)

    # Step 5
    if word.endswith("e"):
        if len(word) - 1 >= r2 or (
            len(word) - 1 >= r1 and not _short_syllable_at_end(word[:-1])
        ):
            word = word[:-1]
    elif word.endswith("l"):
        if len(word) - 1 >= r2 and len(word) > 1 and word[-2] == "l":
            word = word[:-1]

    return word.replace("Y", "y")
