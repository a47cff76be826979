"""UDQ (user-defined quantities) and ACTIONX runtime handling.

Rebuild of the slice of opm-common's UDQ/Action machinery the reference
consumes at runtime (EclProblem::applyActions, ebos/eclproblem.hh:1243;
UDQState/Actions from readDeck, SURVEY.md §0.1): UDQ ASSIGN/DEFINE
expressions are (re)evaluated against the live summary vectors at every
report step, and ACTIONX condition blocks trigger their payload keywords
— which are applied to all remaining schedule steps through the same
`_apply_sched_keyword` handlers the deck-order builder uses.

Expression support (the UDQ function set of the ECLIPSE manual that
opm-common's UDQParser accepts): infix + - * / ^ with parentheses,
comparisons (> >= < <= = !=), AND/OR, numeric literals, summary
mnemonics (FOPR, FU...), well/group-qualified vectors written as
``WOPR 'P1'``, scalar functions (ABS EXP LN LOG SQRT NINT), and set
functions over well/group vectors (SUM AVEA AVEG AVEH MAX MIN PROD
NORM1 NORM2 NORMI), e.g. ``SUM(WOPR)`` or ``MAX(WOPR 'P*')``. Division
follows ECL's convention x/0 = 0. UDQ records are lexed by the
expression tokenizer (io/deck.py read_expr_records), so '/' inside a
DEFINE is division — only the line-final '/' terminates the record.
Per-well (WU...) and per-group (GU...) UDQs evaluate the expression
once per entity with bare W/G mnemonics resolved in that entity's
context; results land in the summary stream as ``NAME:entity``.
UPDATE ON/OFF/NEXT freezes or re-enables a DEFINE (UDQ UPDATE record).
"""

from __future__ import annotations

import dataclasses
import fnmatch

import numpy as np

from opm_autodiff_tpu.io.deck import DEFAULT


@dataclasses.dataclass
class ActionDef:
    name: str
    max_runs: int
    min_wait_days: float
    conditions: list       # list of token lists (implicitly ANDed)
    keywords: list         # DeckKeyword payload
    runs: int = 0
    last_run_day: float = -1e30


def parse_actions(deck_keywords: list) -> list[ActionDef]:
    out = []
    for kw in deck_keywords:
        if kw.name != "ACTIONX" or not kw.records:
            continue
        hdr = kw.records[0]
        name = str(hdr[0]) if hdr and hdr[0] is not DEFAULT else "ACT"
        max_runs = int(hdr[1]) if len(hdr) > 1 and hdr[1] is not DEFAULT \
            else 1
        wait = float(hdr[2]) if len(hdr) > 2 and hdr[2] is not DEFAULT \
            else 0.0
        conds = [_resplit([t for t in r if t is not DEFAULT])
                 for r in kw.records[1:] if r]
        out.append(ActionDef(name=name, max_runs=max_runs,
                             min_wait_days=wait, conditions=conds,
                             keywords=list(kw.sub)))
    return out


# ---------------------------------------------------------------------------
# Expression evaluation (recursive descent over record tokens)
# ---------------------------------------------------------------------------

_CMP = {">", "<", ">=", "<=", "=", "==", "!=", "<>"}

_SCALAR_FUNCS = {
    "ABS": abs,
    "EXP": lambda x: float(np.exp(x)),
    "LN": lambda x: float(np.log(max(x, 1e-300))),
    "LOG": lambda x: float(np.log10(max(x, 1e-300))),
    "SQRT": lambda x: float(np.sqrt(max(x, 0.0))),
    "NINT": lambda x: float(round(x)),
}

_SET_FUNCS = {
    "SUM": sum,
    "PROD": lambda v: float(np.prod(v)),
    "MAX": max,
    "MIN": min,
    "AVEA": lambda v: sum(v) / len(v),
    "AVEG": lambda v: float(np.exp(np.mean(np.log(np.maximum(v, 1e-300))))),
    "AVEH": lambda v: len(v) / sum(1.0 / x for x in v),
    "NORM1": lambda v: sum(abs(x) for x in v),
    "NORM2": lambda v: float(np.sqrt(sum(x * x for x in v))),
    "NORMI": lambda v: max(abs(x) for x in v),
}


def _resplit(tokens):
    """Split comparison/paren-glued tokens from the plain record lexer
    (ACTIONX conditions like ``FWPR>5``). Conservative: only tokens
    containing ``( ) < > = !`` are re-lexed, so hyphenated well names
    ('B-2H') survive."""
    from opm_autodiff_tpu.io.deck import _tokenize_expr

    out = []
    for t in tokens:
        if isinstance(t, str) and any(c in t for c in "()<>=!"):
            out.extend(_tokenize_expr(t))
        else:
            out.append(t)
    return out


class _Parser:
    def __init__(self, tokens, lookup, lookup_vector=None):
        self.toks = [t for t in tokens]
        self.i = 0
        self.lookup = lookup
        self.lookup_vector = lookup_vector

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self):
        t = self.peek()
        self.i += 1
        return t

    def expr(self):
        v = self.and_()
        while isinstance(self.peek(), str) and \
                str(self.peek()).upper() == "OR":
            self.take()
            v = float(bool(v) or bool(self.and_()))
        return v

    def and_(self):
        v = self.cmp()
        while isinstance(self.peek(), str) and \
                str(self.peek()).upper() == "AND":
            self.take()
            v = float(bool(v) and bool(self.cmp()))
        return v

    def cmp(self):
        v = self.add()
        t = self.peek()
        if isinstance(t, str) and t in _CMP:
            op = self.take()
            rhs = self.add()
            if op == ">":
                return float(v > rhs)
            if op == "<":
                return float(v < rhs)
            if op == ">=":
                return float(v >= rhs)
            if op == "<=":
                return float(v <= rhs)
            if op in ("=", "=="):
                return float(v == rhs)
            return float(v != rhs)
        return v

    def add(self):
        v = self.mul()
        while self.peek() in ("+", "-"):
            op = self.take()
            rhs = self.mul()
            v = v + rhs if op == "+" else v - rhs
        return v

    def mul(self):
        v = self.unary()
        while self.peek() in ("*", "/"):
            op = self.take()
            rhs = self.unary()
            if op == "*":
                v = v * rhs
            else:
                v = v / rhs if rhs != 0.0 else 0.0  # ECL: x/0 = 0
        return v

    def unary(self):
        if self.peek() == "-":
            self.take()
            return -self.unary()
        if self.peek() == "+":
            self.take()
            return self.unary()
        return self.power()

    def power(self):
        v = self.atom()
        if self.peek() == "^":
            self.take()
            return v ** self.unary()
        return v

    def _set_func(self, fn):
        """FUNC ( MNEMONIC ['pattern'] ): reduce a well/group vector."""
        self.take()  # '('
        mnem = str(self.take()).strip("'\"")
        pattern = None
        if self.peek() not in (")", None):
            pattern = str(self.take()).strip("'\"")
        if self.peek() == ")":
            self.take()
        vec = (self.lookup_vector(mnem, pattern)
               if self.lookup_vector is not None else [])
        if not vec:
            return 0.0
        return float(fn(vec))

    def atom(self):
        t = self.take()
        if t == "(":
            v = self.expr()
            if self.peek() == ")":
                self.take()
            return v
        if isinstance(t, (int, float)):
            return float(t)
        key = str(t).strip("'\"")
        u = key.upper()
        if self.peek() == "(":
            if u in _SCALAR_FUNCS:
                self.take()
                v = self.expr()
                if self.peek() == ")":
                    self.take()
                return float(_SCALAR_FUNCS[u](v))
            if u in _SET_FUNCS:
                return self._set_func(_SET_FUNCS[u])
        # well/group-qualified vector: MNEMONIC 'NAME'
        nxt = self.peek()
        if isinstance(nxt, str) and key[:1] in ("W", "G") \
                and nxt not in _CMP \
                and nxt not in ("+", "-", "*", "/", "^", "(", ")") \
                and str(nxt).upper() not in ("AND", "OR") \
                and not _is_mnemonic_like(nxt):
            qual = str(self.take()).strip("'\"")
            key = f"{key}:{qual}"
        return float(self.lookup(key))


def _is_mnemonic_like(t):
    if not isinstance(t, str):
        return False
    u = t.strip("'\"").upper()
    return len(u) >= 3 and u[0] in "FWGRB" and u[1:].isalnum() \
        and not u.isdigit() and u == t.strip("'\"")


def evaluate(tokens, lookup, lookup_vector=None) -> float:
    return _Parser(tokens, lookup, lookup_vector).expr()


def make_vector_lookup(*sources):
    """lookup_vector(mnem, pattern) over ``NAME:entity`` keyed dicts
    (summary rows, UDQ value stores); earlier sources shadow later."""
    def lv(mnem, pattern=None):
        pref = mnem + ":"
        seen = {}
        for src in sources:
            for k, v in src.items():
                if k.startswith(pref):
                    ent = k[len(pref):]
                    if ent not in seen and (
                            pattern is None
                            or fnmatch.fnmatch(ent, pattern)):
                        seen[ent] = float(v)
        return list(seen.values())

    return lv


# ---------------------------------------------------------------------------
# UDQ
# ---------------------------------------------------------------------------

class UdqEngine:
    """ASSIGN/DEFINE quantities re-evaluated every report step
    (reference: opm-common UDQState; UDQ keyword in the SCHEDULE
    section)."""

    def __init__(self, deck_keywords: list):
        self.defines = []        # (name, tokens)
        self.values = {}
        self.update_mode = {}    # name -> ON/OFF/NEXT
        self._assigns = []       # (name, entity|None, value) for WU/GU
        for kw in deck_keywords:
            if kw.name != "UDQ":
                continue
            for r in kw.records:
                toks = [t for t in r if t is not DEFAULT]
                if not toks:
                    continue
                op = str(toks[0]).upper()
                name = str(toks[1]).strip("'\"")
                if op == "ASSIGN":
                    if name[:2] in ("WU", "GU"):
                        # ASSIGN WUX ['P1'] value — per-entity; entity
                        # set is only known at update time
                        if len(toks) >= 4:
                            self._assigns.append(
                                (name, str(toks[2]).strip("'\""),
                                 float(toks[3])))
                        else:
                            self._assigns.append((name, None,
                                                  float(toks[2])))
                    else:
                        self.values[name] = float(toks[2])
                elif op == "DEFINE":
                    self.defines.append((name, toks[2:]))
                elif op == "UPDATE":
                    self.update_mode[name] = (str(toks[2]).upper()
                                              if len(toks) > 2 else "ON")
                # UNITS records: display-only, ignored

    @property
    def active(self) -> bool:
        return bool(self.defines or self.values or self._assigns)

    @staticmethod
    def _entities(summary_row: dict, prefix: str) -> list:
        """Well ('W') or group ('G') names present in the summary row."""
        out = []
        for k in summary_row:
            if k[:1] == prefix and ":" in k:
                name = k.split(":", 1)[1]
                if name not in out:
                    out.append(name)
        return out

    def update(self, summary_row: dict):
        lv = make_vector_lookup(self.values, summary_row)

        def lookup_in(key, ent=None):
            # entity context: bare W/G mnemonics resolve to this entity
            if ent is not None and ":" not in key \
                    and key[:1] in ("W", "G"):
                qual = f"{key}:{ent}"
                if qual in self.values:
                    return self.values[qual]
                if qual in summary_row:
                    return summary_row[qual]
            if key in self.values:
                return self.values[key]
            return summary_row.get(key, 0.0)

        # materialize deferred per-entity ASSIGNs once entities exist
        done = []
        for name, ent, val in self._assigns:
            ents = ([ent] if ent is not None else
                    self._entities(summary_row, name[0]))
            for e in ents:
                self.values[f"{name}:{e}"] = val
            if ents:
                done.append((name, ent, val))
        for a in done:
            self._assigns.remove(a)

        for name, toks in self.defines:
            mode = self.update_mode.get(name, "ON")
            if mode == "OFF" and self._has_value(name):
                continue
            per_entity = name[:2] in ("WU", "GU")
            try:
                if per_entity:
                    for e in self._entities(summary_row, name[0]):
                        self.values[f"{name}:{e}"] = evaluate(
                            toks, lambda k, _e=e: lookup_in(k, _e), lv)
                else:
                    self.values[name] = evaluate(toks, lookup_in, lv)
            except Exception:
                if not per_entity:
                    self.values.setdefault(name, 0.0)
            if mode == "NEXT" and self._has_value(name):
                self.update_mode[name] = "OFF"
        return self.values

    def _has_value(self, name) -> bool:
        return name in self.values or any(
            k.startswith(name + ":") for k in self.values)


# ---------------------------------------------------------------------------
# ACTIONX runtime
# ---------------------------------------------------------------------------

class ActionManager:
    def __init__(self, actions: list[ActionDef]):
        self.actions = actions

    @property
    def active(self) -> bool:
        return bool(self.actions)

    def poll(self, day: float, summary_row: dict, udq_values: dict):
        """Returns the list of triggered ActionDefs at this report time."""
        def lookup(key):
            if key in udq_values:
                return udq_values[key]
            return summary_row.get(key, 0.0)

        lv = make_vector_lookup(udq_values, summary_row)
        hits = []
        for a in self.actions:
            if a.runs >= a.max_runs:
                continue
            if day - a.last_run_day < a.min_wait_days:
                continue
            try:
                ok = all(bool(evaluate(c, lookup, lv))
                         for c in a.conditions)
            except Exception:
                ok = False
            if ok:
                a.runs += 1
                a.last_run_day = day
                hits.append(a)
        return hits


def apply_action_to_schedule(action: ActionDef, state, from_step: int):
    """Apply the action's payload keywords to every remaining report
    step's well/group snapshots (the reference mutates the shared
    Schedule object; snapshots here are per-step copies)."""
    from opm_autodiff_tpu.io.state import _apply_sched_keyword

    u = state.runspec.unit_system
    for step in state.schedule.steps[from_step:]:
        wells = {w.name: w for w in step.wells}
        tree = step.groups.setdefault("tree", {})
        prod = step.groups.setdefault("prod", {})
        inj = step.groups.setdefault("inj", {})
        net = step.groups.setdefault("net", {})
        for kw in action.keywords:
            _apply_sched_keyword(kw, u, wells, tree, prod, inj,
                                 step.liftopt, net)
