"""Pure-Python oracle of the reference ladder search.

A deliberately slow, direct port of the SEMANTICS of
/root/reference/src/game/board.cc:
  FindStringLiberties (429) / FindStringLibertiesGainingCaptures (451)
  GetLadderLiberties (483) / PreySelections (519) / HunterSelections (575)
  PreyMove (646) / HunterMove (706) / IsLadder (766) / GetLadderMap (1618)
used ONLY as a test fixture to differentially validate the vectorized
search in sayuri_tpu/game/ladder.py + sayuri_tpu/ops/ladder_kernel.py.

Board model: flat n*n int arrays, colors 0=empty 1=black 2=white; simple
ko vertex or -1. Move legality = not occupied, not suicide, not simple-ko
retake (board.cc:203-231, 1086-1089). Ko creation = captured exactly one
stone while every orthogonal neighbour of the move was opponent-or-border
(UpdateBoard, board.cc:1407-1465).
"""

from __future__ import annotations

KMAX_LADDER_NODES = 2000

GOOD_FOR_NEITHER = 0
GOOD_FOR_PREY = 1
GOOD_FOR_HUNTER = 2

NOT_LADDER = 0
LADDER_DEATH = 1
LADDER_ESCAPABLE = 2
LADDER_ATARI = 3
LADDER_TAKE = 4


class OBoard:
    def __init__(self, stones, n, ko=-1):
        self.n = n
        self.s = list(stones)  # flat, row-major, 0/1/2
        self.ko = ko

    def copy(self):
        return OBoard(self.s, self.n, self.ko)

    def nbrs(self, v):
        n = self.n
        r, c = divmod(v, n)
        out = []
        if c + 1 < n:
            out.append(v + 1)
        if c > 0:
            out.append(v - 1)
        if r + 1 < n:
            out.append(v + n)
        if r > 0:
            out.append(v - n)
        return out

    def n_border(self, v):
        return 4 - len(self.nbrs(v))

    def chain(self, v):
        color = self.s[v]
        seen = {v}
        stack = [v]
        while stack:
            u = stack.pop()
            for a in self.nbrs(u):
                if self.s[a] == color and a not in seen:
                    seen.add(a)
                    stack.append(a)
        return seen

    def chain_libs(self, ch):
        libs = set()
        for u in ch:
            for a in self.nbrs(u):
                if self.s[a] == 0:
                    libs.add(a)
        return libs

    def libs_at(self, v):
        return self.chain_libs(self.chain(v))

    def pliberties(self, v):
        return sum(1 for a in self.nbrs(v) if self.s[a] == 0)

    def is_suicide(self, v, color):
        if self.pliberties(v):
            return False
        opp = 3 - color
        for a in self.nbrs(v):
            if self.s[a] == color and len(self.libs_at(a)) >= 2:
                return False
            if self.s[a] == opp and len(self.libs_at(a)) <= 1:
                return False
        return True

    def is_legal(self, v, color):
        if self.s[v] != 0:
            return False
        if self.is_suicide(v, color):
            return False
        if v == self.ko:
            return False
        return True

    def play(self, v, color):
        """PlayMoveAssumeLegal (board.cc:1484-1500)."""
        opp = 3 - color
        eyeplay = all(self.s[a] == opp for a in self.nbrs(v))
        self.s[v] = color
        captured = 0
        captured_vtx = -1
        for a in self.nbrs(v):
            if self.s[a] == opp:
                ch = self.chain(a)
                if not self.chain_libs(ch):
                    for u in ch:
                        self.s[u] = 0
                    captured += len(ch)
                    captured_vtx = a
        if not self.chain_libs(self.chain(v)):
            for u in self.chain(v):
                self.s[u] = 0  # suicide removal (ladder search never hits)
        self.ko = captured_vtx if (captured == 1 and eyeplay) else -1

    # ---- ladder search (board.cc:429-821) ----

    def find_string_liberties(self, vtx, buf):
        """Walk order proxy: liberties in chain-sorted vertex order with
        per-stone direction order E,W,S,N (directions_ = {-1,+1,-n,+n}
        maps to W,E,N,S; order only affects which branch is tried first,
        not the AND-OR value, and budget ties are accepted)."""
        found = 0
        for u in sorted(self.chain(vtx)):
            for a in self.nbrs(u):
                if self.s[a] == 0 and a not in buf:
                    buf.append(a)
                    found += 1
        return found

    def find_gaining_captures(self, vtx, buf):
        color = self.s[vtx]
        opp = 3 - color
        found = 0
        for u in sorted(self.chain(vtx)):
            for a in self.nbrs(u):
                if self.s[a] == opp and len(self.libs_at(a)) == 1:
                    found += self.find_string_liberties(a, buf)
        return found

    def ladder_liberties(self, vtx, color):
        stone_libs = self.pliberties(vtx)
        opp = 3 - color
        num_captures = 0
        potential = 0
        num_conn = 0
        max_conn = stone_libs
        seen_none = object()
        for a in self.nbrs(vtx):
            if self.s[a] == color:
                alibs = len(self.libs_at(a)) - 1
                num_conn += alibs
                max_conn = max(max_conn, alibs)
            elif self.s[a] == opp:
                ch = self.chain(a)
                if len(self.chain_libs(ch)) == 1:
                    num_captures += 1
                    potential += len(ch)
        del seen_none
        return num_captures + max_conn, stone_libs + potential + num_conn

    def prey_selections(self, prey_color, ladder_vtx, think_ko):
        libs = self.libs_at(ladder_vtx)
        if len(libs) >= 2 or (self.ko != -1 and think_ko):
            return GOOD_FOR_PREY, []
        sel = []
        self.find_string_liberties(ladder_vtx, sel)
        not_cap_move = sel[0]
        self.find_gaining_captures(ladder_vtx, sel)
        sel = [v for v in sel if self.is_legal(v, prey_color)]
        if not sel:
            return GOOD_FOR_HUNTER, []
        if not_cap_move in sel:
            lower, upper = self.ladder_liberties(not_cap_move, prey_color)
            if lower >= 3:
                return GOOD_FOR_PREY, []
            if len(sel) == 1 and upper == 1:
                return GOOD_FOR_HUNTER, []
        return GOOD_FOR_NEITHER, sel

    def hunter_selections(self, prey_color, ladder_vtx):
        libs = self.libs_at(ladder_vtx)
        if len(libs) >= 3:
            return GOOD_FOR_PREY, []
        if len(libs) <= 1:
            return GOOD_FOR_HUNTER, []
        buf = []
        self.find_string_liberties(ladder_vtx, buf)
        m1, m2 = buf[0], buf[1]
        sel = []
        if m2 not in self.nbrs(m1):
            hunter = 3 - prey_color
            l1 = self.pliberties(m1)
            l2 = self.pliberties(m2)
            if l1 >= 3 and l2 >= 3:
                return GOOD_FOR_PREY, []
            elif l1 >= 3:
                if self.is_legal(m1, hunter):
                    sel.append(m1)
            elif l2 >= 3:
                if self.is_legal(m2, hunter):
                    sel.append(m2)
            else:
                if self.is_legal(m1, hunter):
                    sel.append(m1)
                if self.is_legal(m2, hunter):
                    sel.append(m2)
        else:
            sel = [m1, m2]
        if not sel:
            return GOOD_FOR_PREY, []
        return GOOD_FOR_NEITHER, sel


def prey_move(board, hunter_vtx, prey_color, ladder_vtx, nodes, fork):
    nodes[0] += 1
    if nodes[0] >= KMAX_LADDER_NODES:
        return GOOD_FOR_PREY
    b = board.copy() if fork else board
    if hunter_vtx != -1:
        b.play(hunter_vtx, 3 - prey_color)
    res, sel = b.prey_selections(prey_color, ladder_vtx, hunter_vtx != -1)
    if res != GOOD_FOR_NEITHER:
        return res
    next_fork = len(sel) != 1
    best = GOOD_FOR_NEITHER
    for v in sel:
        best = hunter_move(b, v, prey_color, ladder_vtx, nodes, next_fork)
        if best == GOOD_FOR_PREY:
            break
    return best


def hunter_move(board, prey_vtx, prey_color, ladder_vtx, nodes, fork):
    nodes[0] += 1
    if nodes[0] >= KMAX_LADDER_NODES:
        return GOOD_FOR_PREY
    b = board.copy() if fork else board
    if prey_vtx != -1:
        b.play(prey_vtx, prey_color)
    res, sel = b.hunter_selections(prey_color, ladder_vtx)
    if res != GOOD_FOR_NEITHER:
        return res
    next_fork = len(sel) != 1
    best = GOOD_FOR_NEITHER
    for v in sel:
        best = prey_move(b, v, prey_color, ladder_vtx, nodes, next_fork)
        if best == GOOD_FOR_HUNTER:
            break
    return best


def is_ladder(board, vtx):
    """IsLadder (board.cc:766-821) -> (bool, vital_moves)."""
    prey_color = board.s[vtx]
    if prey_color == 0:
        return False, []
    buf = []
    board.find_string_liberties(vtx, buf)
    libs = len(buf)
    nodes = [0]
    vital = []
    if libs == 1:
        res = prey_move(board.copy(), -1, prey_color, vtx, nodes, False)
        if res == GOOD_FOR_HUNTER:
            vital.append(buf[0])
    elif libs == 2:
        for vvtx in buf:
            b = board.copy()
            if b.is_legal(vvtx, 3 - prey_color):
                res = prey_move(b, vvtx, prey_color, vtx, nodes, False)
                if res == GOOD_FOR_HUNTER:
                    vital.append(vvtx)
    return bool(vital), vital


def ladder_map(stones, n, ko=-1):
    """GetLadderMap (board.cc:1618-1691): flat [n*n] LadderType ints,
    including its raster-order overwrite of vital-move marks."""
    board = OBoard(stones, n, ko)
    result = [NOT_LADDER] * (n * n)
    ladder_roots = set()
    not_ladder_roots = set()
    for v in range(n * n):
        if board.s[v] == 0:
            continue
        root = min(board.chain(v))
        first_found = False
        vital = []
        if root in ladder_roots:
            libs = len(board.libs_at(v))
        elif root not in not_ladder_roots:
            ok, vital = is_ladder(board, v)
            if ok:
                ladder_roots.add(root)
                first_found = True
                libs = len(board.libs_at(v))
            else:
                not_ladder_roots.add(root)
                continue
        else:
            continue
        result[v] = LADDER_DEATH if libs == 1 else LADDER_ESCAPABLE
        if first_found:
            for m in vital:
                result[m] = LADDER_TAKE if libs == 1 else LADDER_ATARI
    return result
