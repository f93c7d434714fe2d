"""Pure-Python oracle of the reference's safe-area analysis.

Direct port of the SEMANTICS of /root/reference/src/game/board.cc:
  ComputePassAliveArea (1720-1901) — Benson pass-alive strings + vital
  regions + pass-dead opponent regions (the Benson loop ERASES removed
  strings from `ocupied`, board.cc:1817-1821, so dead own stones become
  region cells for the pass-dead scan);
  IsPassAliveString (1901-1955), IsPassDeadRegion (1957-2051),
  ComputeInnerRegions (2053-2107), ComputeSafeArea (1706-1718).
Used ONLY as a test fixture to differentially validate the vectorized
implementation in sayuri_tpu/game/analysis.py; itself validated against
the reference binary's `sayuri-planes` area planes (test_passdead.py).

Board model: flat n*n ints, 0=empty 1=black 2=white; color param 0/1.
"""

from __future__ import annotations


def _nbrs(v, n):
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


def _diags(v, n):
    r, c = divmod(v, n)
    out = []
    for dr, dc in ((1, 1), (1, -1), (-1, 1), (-1, -1)):
        rr, cc = r + dr, c + dc
        out.append(rr * n + cc if 0 <= rr < n and 0 <= cc < n else None)
    return out


def _components(cells, n):
    cells = set(cells)
    comps = []
    while cells:
        v = cells.pop()
        comp = {v}
        stack = [v]
        while stack:
            u = stack.pop()
            for a in _nbrs(u, n):
                if a in cells:
                    cells.discard(a)
                    comp.add(a)
                    stack.append(a)
        comps.append(comp)
    return comps


def pass_alive_area(stones, n, color):
    """[n*n] bools: ComputePassAliveArea(color, mark_vitals=True,
    mark_pass_dead=True); allow_sucide = false throughout."""
    c = color + 1
    o = 3 - c
    nn = n * n
    result = [False] * nn

    # ocupied: c stones -> c, everything else empty (board.cc:1726-1737)
    ocupied = [c if stones[v] == c else 0 for v in range(nn)]

    # regions (static for Benson): components of non-c cells
    regions = _components([v for v in range(nn) if ocupied[v] == 0], n)
    region_of = {}
    for i, reg in enumerate(regions):
        for v in reg:
            region_of[v] = i

    # potential vital regions (board.cc:1750-1791)
    vital = [False] * len(regions)
    for i, reg in enumerate(regions):
        ok = True
        for v in reg:
            if stones[v] == 0:
                if not any(ocupied[a] == c for a in _nbrs(v, n)):
                    ok = False
                    break
            # opp stones are auto-vital under no-suicide
        vital[i] = ok

    strings = _components([v for v in range(nn) if ocupied[v] == c], n)
    string_of = {}
    for i, st in enumerate(strings):
        for v in st:
            string_of[v] = i
    alive = [True] * len(strings)

    def is_pass_alive_string(i):
        """IsPassAliveString (board.cc:1901-1955): >=2 distinct vital
        regions all of whose EMPTY cells are adjacent to this string."""
        vit = set()
        for v in strings[i]:
            for a in _nbrs(v, n):
                j = region_of.get(a)
                if j is None or not vital[j]:
                    continue
                good = True
                for rv in regions[j]:
                    if stones[rv] == 0:
                        if not any(
                            string_of.get(aa) == i for aa in _nbrs(rv, n)
                        ):
                            good = False
                            break
                if good:
                    vit.add(j)
        return len(vit) >= 2

    # Benson loop (board.cc:1799-1848): remove non-pass-alive strings,
    # erase them from ocupied, and de-vitalize adjacent regions.
    changed = True
    while changed:
        changed = False
        for i in range(len(strings)):
            if not alive[i]:
                continue
            if not is_pass_alive_string(i):
                alive[i] = False
                changed = True
                for v in strings[i]:
                    ocupied[v] = 0
                    string_of.pop(v, None)
                    for a in _nbrs(v, n):
                        j = region_of.get(a)
                        if j is not None:
                            vital[j] = False

    # mark alive strings + their (still-)vital regions (board.cc:1850-1879)
    for i, st in enumerate(strings):
        if alive[i]:
            for v in st:
                result[v] = True
    for j, reg in enumerate(regions):
        if vital[j]:
            for v in reg:
                result[v] = True
                ocupied[v] = c

    # pass-dead regions over the MUTATED ocupied (board.cc:1882-1899)
    regions2 = _components([v for v in range(nn) if ocupied[v] == 0], n)
    for reg in regions2:
        if _is_pass_dead_region(reg, stones, ocupied, n, o, c):
            for v in reg:
                result[v] = True
    return result


def _compute_inner_regions(reg, n):
    """ComputeInnerRegions (board.cc:2053-2107): components of on-board
    cells NOT in `reg` that do not touch the board edge."""
    nn = n * n
    inner = set()
    for comp in _components([v for v in range(nn) if v not in reg], n):
        if not any(len(_nbrs(v, n)) < 4 for v in comp):
            inner |= comp
    return inner


def _is_pass_dead_region(reg, stones, ocupied, n, o, c):
    """IsPassDeadRegion(reg, owner=o) (board.cc:1957-2051)."""
    inner = _compute_inner_regions(reg, n)

    eyes = []
    for v in sorted(reg):
        # IsPotentialEye(v, o): my own real stone cannot become my eye
        if stones[v] == o:
            continue
        # sides: no c-valued feature (alive c stones or vital cells)
        if any(ocupied[a] == c for a in _nbrs(v, n)):
            continue
        cnt_invalid = 0
        cnt_c = 0
        for a in _diags(v, n):
            if a is None:
                cnt_invalid += 1
            elif a in inner:
                pass  # inner corner counts as the region owner
            elif ocupied[a] == c:
                cnt_c += 1
        if (cnt_c > 1) if cnt_invalid == 0 else (cnt_c > 0):
            continue
        eyes.append(v)

    count = len(eyes)
    if count == 2 and eyes[1] in _nbrs(eyes[0], n):
        count -= 1
    return count < 2


def safe_area(stones, n):
    """ComputeSafeArea(result, mark_seki=False) (board.cc:1706-1718)."""
    a = pass_alive_area(stones, n, 0)
    b = pass_alive_area(stones, n, 1)
    return [x or y for x, y in zip(a, b)]
