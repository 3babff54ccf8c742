"""Final alignment records: CIGAR/NM/MD generation and SAM emission.

Ports of the reference's hit->SAM conversion (reference:
src/bwamem.c:2344-2438 mem_reg2aln, :1506-1688 mem_aln2sam,
src/bwa.c:111-217 bwa_gen_cigar2, src/bwamem_extra.c mem_gen_alt), with the
same band inference, band-doubling retry, leading/trailing-deletion squeeze,
clipping rules, NM/MD computation and tag set.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..index.format import FMIndex
from ..oracle.ksw import CIGAR_M, CIGAR_I, CIGAR_D, CIGAR_S
from ..ops.globalalign import ksw_global
from .options import (MemOptions, MEM_F_SOFTCLIP, MEM_F_ALL,
                      MEM_F_NO_MULTI)

INT_MAX = 1 << 30
from .regions import AlnReg, mem_approx_mapq_se

CIGAR_CHARS = "MIDSH"
_FWD_BASES = "ACGTN"
_REV_BASES = "TGCAN"
_FWD_LUT = np.frombuffer(b"ACGTN", np.uint8)
_REV_LUT = np.frombuffer(b"TGCAN", np.uint8)


@dataclass
class MemAln:
    pos: int = -1
    rid: int = -1
    flag: int = 0
    is_rev: bool = False
    is_alt: bool = False
    mapq: int = 0
    NM: int = -1
    cigar: list = field(default_factory=list)  # [(op, len)]
    md: str = ""
    score: int = 0
    sub: int = -1
    alt_sc: int = 0
    XA: str | None = None


def fetch_ref_window(idx: FMIndex, rb: int, re: int):
    """[rb, re) in doubled coords, single strand (reference: bns_get_seq)."""
    lp = idx.l_pac
    if rb < lp < re:
        raise ValueError("window bridges the forward-reverse boundary")
    b, e, seq = idx.fetch_seq(rb, re, mid=rb)
    assert b == rb and e == re
    return seq, rb >= lp


def infer_bw(l1: int, l2: int, score: int, a: int, q: int, r: int) -> int:
    """reference: src/bwamem.c:1483-1491."""
    if l1 == l2 and l1 * a - score < (q + r - a) << 1:
        return 0
    w = int((min(l1, l2) * a - score - q) / r + 2.0)
    return max(w, abs(l1 - l2))


def gen_cigar(opt: MemOptions, idx: FMIndex, query: np.ndarray,
              rb: int, re: int, w_: int):
    """bwa_gen_cigar2 equivalent. query = read slice [qb:qe] (codes).
    Returns (score, cigar [(op,len)], NM, MD)."""
    l_query = len(query)
    if l_query <= 0 or rb >= re or (rb < idx.l_pac < re):
        return 0, [], -1, ""
    rseq, is_rev = fetch_ref_window(idx, rb, re)
    rlen = len(rseq)
    q = query
    if is_rev:  # reverse both to place indels at the leftmost position
        q = q[::-1]
        rseq = rseq[::-1]
    mat = opt.mat
    if l_query == re - rb and w_ == 0:
        cigar = [(CIGAR_M, l_query)]
        score = int(mat[rseq, q].sum())
    else:
        max_ins = int((((l_query + 1) >> 1) * mat[0, 0] - opt.o_ins)
                      / opt.e_ins + 1.0)
        max_del = int((((l_query + 1) >> 1) * mat[0, 0] - opt.o_del)
                      / opt.e_del + 1.0)
        max_gap = max(max_ins, max_del, 1)
        w = (max_gap + abs(rlen - l_query) + 1) >> 1
        w = min(w, w_)
        w = max(w, abs(rlen - l_query) + 3)
        score, cigar = ksw_global(q, rseq, mat, opt.o_del, opt.e_del,
                                  opt.o_ins, opt.e_ins, w)
    # NM / MD
    int2base = _REV_BASES if is_rev else _FWD_BASES
    md_parts: list[str] = []
    x = y = u = 0
    n_mm = n_gap = 0
    for k, (op, ln) in enumerate(cigar):
        if op == CIGAR_M:
            mism = np.nonzero(q[x : x + ln] != rseq[y : y + ln])[0]
            prev = -1
            for i in mism:
                i = int(i)
                md_parts.append(str(u + i - prev - 1))
                md_parts.append(int2base[int(rseq[y + i])])
                prev = i
                u = 0
            n_mm += len(mism)
            if len(mism):
                u = ln - 1 - int(mism[-1])
            else:
                u += ln
            x += ln
            y += ln
        elif op == CIGAR_D:
            if 0 < k < len(cigar) - 1:
                md_parts.append(str(u))
                md_parts.append("^" + "".join(
                    int2base[int(rseq[y + i])] for i in range(ln)))
                u = 0
                n_gap += ln
            y += ln
        elif op == CIGAR_I:
            x += ln
            n_gap += ln
    md_parts.append(str(u))
    return score, cigar, n_mm + n_gap, "".join(md_parts)


def mem_reg2aln(opt: MemOptions, idx: FMIndex, l_query: int,
                query: np.ndarray, ar: AlnReg | None) -> MemAln:
    """reference: src/bwamem.c:2344-2438."""
    a = MemAln()
    if ar is None or ar.rb < 0 or ar.re < 0:
        a.rid = -1
        a.pos = -1
        a.flag |= 0x4
        return a
    qb, qe, rb, re = ar.qb, ar.qe, ar.rb, ar.re
    a.mapq = mem_approx_mapq_se(opt, ar) if ar.secondary < 0 else 0
    if ar.secondary >= 0:
        a.flag |= 0x100
    w2 = max(
        infer_bw(qe - qb, re - rb, ar.truesc, opt.a, opt.o_del, opt.e_del),
        infer_bw(qe - qb, re - rb, ar.truesc, opt.a, opt.o_ins, opt.e_ins),
    )
    if w2 > opt.w:
        w2 = min(w2, ar.w)
    last_sc = -(1 << 30)
    i = 0
    while True:
        w2 = min(w2, opt.w << 2)
        score, cigar, NM, md = gen_cigar(opt, idx, query[qb:qe], rb, re, w2)
        if score == last_sc or w2 == opt.w << 2:
            break
        last_sc = score
        w2 <<= 1
        i += 1
        if not (i < 3 and score < ar.truesc - opt.a):
            break
    a.NM = NM
    a.md = md
    lp = idx.l_pac
    pos_d = rb if rb < lp else re - 1
    is_rev = pos_d >= lp
    pos = ((lp << 1) - 1 - pos_d) if is_rev else pos_d
    a.is_rev = is_rev
    if cigar:  # squeeze out leading or trailing deletions
        if cigar[0][0] == CIGAR_D:
            pos += cigar[0][1]
            cigar = cigar[1:]
        elif cigar[-1][0] == CIGAR_D:
            cigar = cigar[:-1]
    if qb != 0 or qe != l_query:
        clip5 = l_query - qe if is_rev else qb
        clip3 = qb if is_rev else l_query - qe
        if clip5:
            cigar = [(CIGAR_S, clip5)] + cigar
        if clip3:
            cigar = cigar + [(CIGAR_S, clip3)]
    a.cigar = cigar
    a.rid = idx.ann.pos_to_rid(pos)
    assert a.rid == ar.rid, (a.rid, ar.rid)
    a.pos = pos - idx.ann.offsets[a.rid]
    a.score = ar.score
    a.sub = max(ar.sub, ar.csub)
    a.is_alt = ar.is_alt
    a.alt_sc = ar.alt_sc
    return a


def _get_pri_idx(xa_drop: float, regs: list[AlnReg], i: int) -> int:
    k = regs[i].secondary_all
    if k >= 0 and regs[i].score >= regs[k].score * xa_drop:
        return k
    return -1


def mem_gen_alt(opt: MemOptions, idx: FMIndex, regs: list[AlnReg],
                l_query: int, query: np.ndarray) -> list[str | None]:
    """XA:Z strings per region (reference: src/bwamem_extra.c mem_gen_alt).
    Only valid after mem_mark_primary_se."""
    n = len(regs)
    cnt = [0] * n
    has_alt = [False] * n
    tot = 0
    for i in range(n):
        r = _get_pri_idx(opt.XA_drop_ratio, regs, i)
        if r >= 0:
            cnt[r] += 1
            tot += 1
            if regs[i].is_alt:
                has_alt[r] = True
    XA: list[str | None] = [None] * n
    if tot == 0:
        return XA
    parts: list[list[str]] = [[] for _ in range(n)]
    for i in range(n):
        r = _get_pri_idx(opt.XA_drop_ratio, regs, i)
        if r < 0:
            continue
        if cnt[r] > opt.max_XA_hits_alt or \
                (not has_alt[r] and cnt[r] > opt.max_XA_hits):
            continue
        t = mem_reg2aln(opt, idx, l_query, query, regs[i])
        cig = "".join(f"{ln}{CIGAR_CHARS[op]}" for op, ln in t.cigar)
        parts[r].append(
            f"{idx.ann.names[t.rid]},{'+-'[t.is_rev]}{t.pos + 1},{cig},{t.NM};"
        )
    for k in range(n):
        if parts[k]:
            XA[k] = "".join(parts[k])
    return XA


def get_rlen(cigar) -> int:
    return sum(ln for op, ln in cigar if op in (CIGAR_M, CIGAR_D))


def mem_aln2sam(opt: MemOptions, idx: FMIndex, name: str, seq: np.ndarray,
                qual: str | None, n: int, alns: list[MemAln], which: int,
                m: MemAln | None = None, comment: str | None = None,
                rg_id: str | None = None) -> str:
    """One SAM line (reference: src/bwamem.c:1506-1688). `seq` is the
    original read in 0..4 codes, forward orientation."""
    p = alns[which]
    flag = p.flag
    rid, pos, is_rev, cigar = p.rid, p.pos, p.is_rev, list(p.cigar)
    n_cigar = len(cigar)
    if m is not None:
        flag |= 0x1
        if m.rid < 0:
            flag |= 0x8
    if rid < 0:
        flag |= 0x4
        if m is not None and m.rid >= 0:  # copy mate coordinates
            rid, pos, is_rev, cigar, n_cigar = m.rid, m.pos, m.is_rev, [], 0
    mrid, mpos, mis_rev = (m.rid, m.pos, m.is_rev) if m is not None else (-1, -1, False)
    mcigar = list(m.cigar) if m is not None else []
    if m is not None and m.rid < 0 and rid >= 0:
        mrid, mpos, mis_rev, mcigar = rid, pos, is_rev, []
    if is_rev:
        flag |= 0x10
    if m is not None and mis_rev:
        flag |= 0x20

    out = [name, str((flag & 0xFFFF) | (0x100 if flag & 0x10000 else 0))]
    if rid >= 0:
        cig_str = ""
        if n_cigar:
            ops = []
            for c_op, ln in cigar:
                c = c_op
                if not (opt.flag & MEM_F_SOFTCLIP) and not p.is_alt \
                        and c in (3, 4):
                    c = 4 if which else 3
                ops.append(f"{ln}{CIGAR_CHARS[c]}")
            cig_str = "".join(ops)
        else:
            cig_str = "*"
        out += [idx.ann.names[rid], str(pos + 1), str(p.mapq), cig_str]
    else:
        out += ["*", "0", "0", "*"]

    # mate position
    if m is not None and mrid >= 0:
        rnext = "=" if rid == mrid else idx.ann.names[mrid]
        if rid == mrid:
            p0 = pos + (get_rlen(cigar) - 1 if is_rev else 0)
            p1 = mpos + (get_rlen(mcigar) - 1 if mis_rev else 0)
            if not mcigar or not cigar:
                tlen = 0
            else:
                tlen = -(p0 - p1 + (1 if p0 > p1 else -1 if p0 < p1 else 0))
        else:
            tlen = 0
        out += [rnext, str(mpos + 1), str(tlen)]
    else:
        out += ["*", "0", "0"]

    # SEQ / QUAL
    if flag & 0x100:
        out += ["*", "*"]
    else:
        qb, qe = 0, len(seq)
        if n_cigar and which and not (opt.flag & MEM_F_SOFTCLIP) \
                and not p.is_alt:
            if cigar[0][0] in (3, 4):
                if is_rev:
                    qe -= cigar[0][1]
                else:
                    qb += cigar[0][1]
            if cigar[-1][0] in (3, 4):
                if is_rev:
                    qb += cigar[-1][1]
                else:
                    qe -= cigar[-1][1]
        if not is_rev:
            s_str = _FWD_LUT[np.asarray(seq[qb:qe])].tobytes().decode()
            q_str = qual[qb:qe] if qual else "*"
        else:
            s_str = _REV_LUT[np.asarray(seq[qb:qe][::-1])].tobytes().decode()
            q_str = qual[qb:qe][::-1] if qual else "*"
        out += [s_str, q_str if q_str else "*"]

    # tags
    tags = []
    if n_cigar:
        tags.append(f"NM:i:{p.NM}")
        tags.append(f"MD:Z:{p.md}")
    if p.score >= 0:
        tags.append(f"AS:i:{p.score}")
    if p.sub >= 0:
        tags.append(f"XS:i:{p.sub}")
    if rg_id:
        tags.append(f"RG:Z:{rg_id}")
    if not (flag & 0x100):
        others = [i for i in range(n)
                  if i != which and not (alns[i].flag & 0x100)]
        if others:
            sa = []
            for i in range(n):
                r = alns[i]
                if i == which or (r.flag & 0x100):
                    continue
                cig = "".join(f"{ln}{CIGAR_CHARS[op]}" for op, ln in r.cigar)
                sa.append(f"{idx.ann.names[r.rid]},{r.pos + 1},"
                          f"{'+-'[r.is_rev]},{cig},{r.mapq},{r.NM};")
            tags.append("SA:Z:" + "".join(sa))
        if p.alt_sc > 0:
            tags.append(f"pa:f:{p.score / p.alt_sc:.3f}")
    if p.XA:
        tags.append(f"XA:Z:{p.XA}")
    from .options import MEM_F_REF_HDR

    if (opt.flag & MEM_F_REF_HDR) and p.rid >= 0:
        anno = idx.ann.anno_of(p.rid)
        if anno:  # reference replaces TABs with spaces (src/bwamem.c:1678)
            tags.append("XR:Z:" + anno.replace("\t", " "))
    if comment:
        tags.append(comment)
    return "\t".join(out + tags)


def mem_reg2sam(opt: MemOptions, idx: FMIndex, name: str, seq: np.ndarray,
                qual, regs: list[AlnReg], extra_flag: int = 0,
                mate: MemAln | None = None, rg_id=None,
                comment: str | None = None) -> list[str]:
    """reference: src/bwamem.c:1721-1775."""
    XA = None
    if not (opt.flag & MEM_F_ALL):
        XA = mem_gen_alt(opt, idx, regs, len(seq), seq)
    alns: list[MemAln] = []
    for k, p in enumerate(regs):
        if p.score < opt.T:
            continue
        if p.secondary >= 0 and (p.is_alt or not (opt.flag & MEM_F_ALL)):
            continue
        if (0 <= p.secondary < INT_MAX
                and p.score < regs[p.secondary].score * opt.drop_ratio):
            continue
        q = mem_reg2aln(opt, idx, len(seq), seq, p)
        q.XA = XA[k] if XA else None
        q.flag |= extra_flag
        if p.secondary >= 0:
            q.sub = -1
        if alns and p.secondary < 0:
            q.flag |= 0x10000 if (opt.flag & MEM_F_NO_MULTI) else 0x800
        if alns and not p.is_alt and q.mapq > alns[0].mapq:
            q.mapq = alns[0].mapq
        alns.append(q)
    if not alns:
        t = mem_reg2aln(opt, idx, len(seq), seq, None)
        t.flag |= extra_flag
        return [mem_aln2sam(opt, idx, name, seq, qual, 1, [t], 0, mate,
                            rg_id=rg_id, comment=comment)]
    return [mem_aln2sam(opt, idx, name, seq, qual, len(alns), alns, k, mate,
                        rg_id=rg_id, comment=comment)
            for k in range(len(alns))]
