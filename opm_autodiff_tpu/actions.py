"""UDQ (user-defined quantities) and ACTIONX runtime handling.

Rebuild of the slice of opm-common's UDQ/Action machinery the reference
consumes at runtime (EclProblem::applyActions, ebos/eclproblem.hh:1243;
UDQState/Actions from readDeck, SURVEY.md §0.1): UDQ ASSIGN/DEFINE
expressions are (re)evaluated against the live summary vectors at every
report step, and ACTIONX condition blocks trigger their payload keywords
— which are applied to all remaining schedule steps through the same
`_apply_sched_keyword` handlers the deck-order builder uses.

Expression support: infix + - * with parentheses, comparisons
(> >= < <= = !=), AND/OR, numeric literals, summary mnemonics (FOPR,
FU...), and well-qualified vectors written as ``WOPR 'P1'``. Division is
not supported (ECL's '/' collides with the record terminator in this
tokenizer); use multiplicative constants instead.
"""

from __future__ import annotations

import dataclasses

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
        conds = [[t for t in r if t is not DEFAULT] for r in kw.records[1:]
                 if r]
        out.append(ActionDef(name=name, max_runs=max_runs,
                             min_wait_days=wait, conditions=conds,
                             keywords=list(kw.sub)))
    return out


# ---------------------------------------------------------------------------
# Expression evaluation (recursive descent over record tokens)
# ---------------------------------------------------------------------------

_CMP = {">", "<", ">=", "<=", "=", "==", "!=", "<>"}


class _Parser:
    def __init__(self, tokens, lookup):
        self.toks = [t for t in tokens]
        self.i = 0
        self.lookup = lookup

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
        while self.peek() == "*":
            self.take()
            v = v * self.unary()
        return v

    def unary(self):
        if self.peek() == "-":
            self.take()
            return -self.unary()
        return self.atom()

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
        # well/group-qualified vector: MNEMONIC 'NAME'
        nxt = self.peek()
        if isinstance(nxt, str) and key[:1] in ("W", "G") \
                and nxt not in _CMP and nxt not in ("+", "-", "*", "(",
                                                    ")") \
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


def evaluate(tokens, lookup) -> float:
    return _Parser(tokens, lookup).expr()


# ---------------------------------------------------------------------------
# UDQ
# ---------------------------------------------------------------------------

class UdqEngine:
    """ASSIGN/DEFINE quantities re-evaluated every report step
    (reference: opm-common UDQState; UDQ keyword in the SCHEDULE
    section)."""

    def __init__(self, deck_keywords: list):
        self.defines = []   # (name, tokens)
        self.values = {}
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
                    self.values[name] = float(toks[2])
                elif op == "DEFINE":
                    self.defines.append((name, toks[2:]))

    @property
    def active(self) -> bool:
        return bool(self.defines or self.values)

    def update(self, summary_row: dict):
        def lookup(key):
            if key in self.values:
                return self.values[key]
            return summary_row.get(key, 0.0)

        for name, toks in self.defines:
            try:
                self.values[name] = evaluate(toks, lookup)
            except Exception:
                self.values[name] = 0.0
        return self.values


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

        hits = []
        for a in self.actions:
            if a.runs >= a.max_runs:
                continue
            if day - a.last_run_day < a.min_wait_days:
                continue
            try:
                ok = all(bool(evaluate(c, lookup)) for c in a.conditions)
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
