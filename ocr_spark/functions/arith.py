"""Arithmetic verdict kernels.

Re-expresses the reference's equation-grading semantics
(reference utils.py:50-117 ``eval_label``) WITHOUT Python ``eval()``:
a tiny recursive-descent evaluator covers exactly the arithmetic
expression subset the reference can ever feed to ``eval`` (integers,
decimals, ``+ - * / // % ~`` unary signs, parentheses). Anything
outside that subset raises, which the verdict maps to ``'problem'`` —
the same observable behavior as the reference's blanket
``except: return 'problem'`` (utils.py:116-117).

Verdict semantics (all quirks preserved):

- split on '='; left = segment[0], right = segment[1] (NOT the last —
  "1+1=2=3" grades against "2").
- '×' -> '*' on the left side only.
- remainder form: if '÷' in left and right contains '*' or '~', grade
  quotient/remainder via floor-div and mod; when both '*' and '~'
  appear in the right side, '~' wins (it is applied last).
- plain form: '÷' -> true division; compare float result to
  ``int(right)`` (so "1÷3×3=1" is 'error' — exact float compare).
- any parse/convert/zero-division failure -> 'problem'.

Repair helpers (reference pipline.py:381-549) are transcribed for
operator-inventory parity; note the reference's live path
(``revise_result``, pipline.py:556-571) only calls ``eval_label``.
"""

from __future__ import annotations

import re
from functools import lru_cache

_NUM_RE = re.compile(r"\d[\d.]*|\.\d+")


class _ExprError(ValueError):
    pass


class _Parser:
    """Arithmetic expression evaluator with Python numeric semantics."""

    __slots__ = ("s", "i", "n")

    def __init__(self, s: str):
        self.s = s
        self.i = 0
        self.n = len(s)

    def _skip_ws(self):
        while self.i < self.n and self.s[self.i] in " \t":
            self.i += 1

    def _peek(self):
        self._skip_ws()
        return self.s[self.i] if self.i < self.n else ""

    def parse(self):
        v = self._expr()
        self._skip_ws()
        if self.i != self.n:
            raise _ExprError(f"trailing input at {self.i}")
        return v

    def _expr(self):
        v = self._term()
        while True:
            c = self._peek()
            if c == "+":
                self.i += 1
                v = v + self._term()
            elif c == "-":
                self.i += 1
                v = v - self._term()
            else:
                return v

    def _term(self):
        v = self._factor()
        while True:
            c = self._peek()
            if c == "*":
                self.i += 1
                v = v * self._factor()
            elif c == "/":
                self.i += 1
                if self.i < self.n and self.s[self.i] == "/":
                    self.i += 1
                    v = v // self._factor()
                else:
                    v = v / self._factor()
            elif c == "%":
                self.i += 1
                v = v % self._factor()
            else:
                return v

    def _factor(self):
        c = self._peek()
        if c == "+":
            self.i += 1
            return +self._factor()
        if c == "-":
            self.i += 1
            return -self._factor()
        if c == "~":
            self.i += 1
            v = self._factor()
            if not isinstance(v, int):
                raise _ExprError("~ needs int")
            return ~v
        return self._atom()

    def _atom(self):
        c = self._peek()
        if c == "(":
            self.i += 1
            v = self._expr()
            if self._peek() != ")":
                raise _ExprError("missing )")
            self.i += 1
            # adjacency like "2(3)" or "(1)(2)" is a TypeError under
            # Python eval -> must also fail here
            nxt = self._peek()
            if nxt and nxt in "(.0123456789":
                raise _ExprError("invalid adjacency")
            return v
        m = _NUM_RE.match(self.s, self.i)
        if not m:
            raise _ExprError(f"unexpected char at {self.i}")
        tok = m.group(0)
        self.i = m.end()
        nxt = self._peek()
        if nxt and nxt in "(.":
            raise _ExprError("invalid adjacency")
        if "." in tok:
            if tok.count(".") > 1:
                raise _ExprError("bad float")
            return float(tok)
        # Python 3 int literals: no leading zeros on multi-digit ints —
        # EXCEPT all-zero literals ('00', '000' are legal zeros), which
        # real decodes do produce (e.g. '10' misread as '00'); the
        # reference's eval() accepts them (evaluate via utils.py:73-107)
        if len(tok) > 1 and tok[0] == "0" and set(tok) != {"0"}:
            raise _ExprError("leading zero int")
        return int(tok)


def safe_eval(expr: str):
    """Evaluate an arithmetic expression string; raises on anything else."""
    return _Parser(expr).parse()


@lru_cache(maxsize=1 << 16)
def eval_verdict(label: str) -> str:
    """Grade one equation string -> 'right' | 'error' | 'problem'."""
    try:
        if "=" not in label or label == "":
            return "problem"
        parts = label.split("=")
        left, right = parts[0], parts[1]
        if right == "" or left == "":
            return "problem"
        left = left.replace("×", "*")
        if "÷" in left and ("*" in right or "~" in right):
            quot = safe_eval(left.replace("÷", "//"))
            rem = safe_eval(left.replace("÷", "%"))
            r1s = r2s = ""
            if "*" in right:
                r1s, r2s = right.split("*")[0], right.split("*")[-1]
            if "~" in right:
                r1s, r2s = right.split("~")[0], right.split("~")[-1]
            r1 = safe_eval(r1s)
            r2 = safe_eval(r2s)
            return "right" if (r1 == int(quot) and r2 == int(rem)) else "error"
        if "÷" in left:
            left = left.replace("÷", "/")
        return "right" if safe_eval(left) == int(right) else "error"
    except Exception:
        return "problem"


# ---------------------------------------------------------------------------
# Repair helpers (reference pipline.py:381-549). Inventory parity only —
# the live reference path never invokes them (revise_result strips them,
# pipline.py:556-571) so the extraction pipeline does not either.
# ---------------------------------------------------------------------------

# NOTE the reference patterns '[+,-,×,÷,(,)]' / '[+,-,*,/,(]' contain the
# range ',-,' (comma..comma == comma), so '-' is NOT part of the class.
# We spell the actual character set explicitly.
_SPLIT_HEAD_RE = re.compile(r"[+,×÷()]")
_SPLIT_OPERAND_RE = re.compile(r"[+,*/(]")


def trim_repair(label: str) -> tuple[str, str, str]:
    """Try trimming 1-2 chars from head/tail until 'right'
    (reference pipline.py:402-450 ``delete_top_or_bottom``).

    Returns (state, last_tried_variant, original).
    """
    tried = label
    state0 = eval_verdict(label)
    state = state0
    for variant in (label[1:], label[2:], label[:-1], label[1:-1], label[2:-1]):
        if state == "right":
            break
        tried = variant
        state = eval_verdict(variant)
    if state != "right":
        state = state0
    return state, tried, label


def pair_concat_repair(label1: str, label2: str) -> tuple[str, str, str]:
    """Try 5 concatenation variants of two labels
    (reference pipline.py:381-399 ``delete_pair_problem_result``)."""
    state, revised, out = trim_repair(label1 + label2)
    for cand in (
        label1[:-1] + label2,
        label1 + label2[1:],
        label1[:-1] + label2[1:],
        label1 + "=" + label2[1:],
    ):
        if state == "right":
            break
        state, revised, out = trim_repair(cand)
    return state, revised, out


def digit_fix_count(label: str) -> int:
    """Count single-char digit substitutions that make the label 'right'
    (reference pipline.py:474-489 ``correct_problem``; includes its
    dedup of '*'-segments preserving first occurrence)."""
    segs = label.split("*")
    uniq = list(dict.fromkeys(segs))
    label = "*".join(uniq)
    n = 0
    for i in range(len(label)):
        for d in "1234567890":
            if eval_verdict(label[:i] + d + label[i + 1:]) == "right":
                n += 1
    return n


def promote_problem(label: str) -> str:
    """Pick the trim variant maximizing digit_fix_count
    (reference pipline.py:454-471 ``pro_problem_to_right``)."""
    if len(_SPLIT_HEAD_RE.split(label)[0]) > 3:
        label = label[1:]
    best = digit_fix_count(label)
    if best > 0:
        return label
    # each variant is taken from the *current* label — a later trim
    # compounds an earlier accepted one (reference pipline.py:461-469)
    for trim in (lambda s: s[1:], lambda s: s[: len(s) - 1], lambda s: s[1 : len(s) - 1]):
        cand = trim(label)
        score = digit_fix_count(cand)
        if score > best and eval_verdict(cand) != "problem":
            best = score
            label = cand
    return label


def bracket_repair(label: str) -> tuple[str, str]:
    """Insert a missing '(' or ')' around each operand, pick the first
    'right' else the most-fixable 'error'
    (reference pipline.py:491-549 ``add_bracket``)."""
    if "=" not in label or label == "":
        return label, "problem"
    left, right = label.split("=")[0], label.split("=")[1]
    if right == "" or left == "":
        return label, "problem"

    errors: list[str] = []
    if "(" in left and ")" not in left:
        for num in _SPLIT_OPERAND_RE.split(left):
            cand = left.replace(num, num + ")") + "=" + right
            state = eval_verdict(cand)
            if state == "right":
                return left.replace(num, num + ")"), "right"
            if state == "error":
                errors.append(cand)
    elif ")" in left and "(" not in left:
        for num in _SPLIT_OPERAND_RE.split(left):
            fixed_left = left.replace(num, "(" + num)
            state = eval_verdict(fixed_left + "=" + right)
            if state == "right":
                return fixed_left, "right"
            if state == "error":
                errors.append(fixed_left)
    else:
        return label, "problem"

    if errors:
        best_n = 0
        best = errors[0]
        for cand in errors:
            n = digit_fix_count(cand)
            if n > best_n:
                best_n = n
                best = cand
        return best, "error"
    return label, "problem"
