"""Generate the shape-matched replica manifest from the reference's
committed per-matrix results (scripts/results_suiteSparse_dataset/k128/
results_128.csv) + the download script's SuiteSparse group names.

Writes bsmr_sddmm_tpu/data/suitesparse_replicas.csv with one row per
reference matrix: name, group, regime, M, N, NNZ, and the reference's
measured best-BSMR GFLOPS at each K (the numbers to beat).
"""
import csv
import os
import re

REF = "/root/reference/scripts"

# SuiteSparse group -> structural regime for the replica generator.
MESH = {"HB", "Boeing", "DNVS", "Oberwolfach", "GHS_psdef", "GHS_indef",
        "Schenk_IBMNA", "Schenk_AFE", "Schenk_ISEI", "Schenk", "TKK",
        "FEMLAB", "PARSEC", "QCD", "Cunningham", "Norris", "Pothen",
        "Rothberg", "Simon", "Nasa", "Castrillon", "MathWorks", "Cylshell",
        "ACUSIM", "AMD", "Gset", "ND", "Lin", "McRae", "Um", "Janna",
        "CEMW", "Dziekonski", "Bodendiek", "Botonakis", "BenElechi",
        "Wissgott", "Zaoui", "Oberwolfach", "Koutsovasilis", "Chevron",
        "INPRO", "DRIVCAV", "Fluorem", "Engwirda", "Averous", "Bai",
        "HVDC", "Muite", "Sanghavi", "TAMU_SmartGridCenter"}
GRAPH = {"SNAP", "DIMACS10", "Pajek", "Gleich", "LAW", "Newman", "Arenas",
         "vanHeukelum", "Barabasi", "Gupta", "Nemeth", "Kamvar",
         "Mycielski", "AG-Monien", "Sybrandt", "MAWI", "GenBank", "Sinclair"}
# LP/optimization & misc: blocked, irregular cluster structure
OPT = {"Hollinger", "TSOPF", "Meszaros", "Mallya", "VanVelzen",
       "Andrianov", "Chen", "Rommes", "VDOL", "GHS_psdef", "Mittelmann",
       "Qaplib", "LPnetlib", "Yoshiyasu", "JGD_Homology", "JGD_Kocay",
       "JGD_Margulies", "JGD_Groebner", "Pereyra", "Bindel", "Shyy",
       "Zitney", "Grund", "Hamm", "HVDC", "IPSO", "Bydder", "Meng",
       "Precima", "Goodwin", "Hohn", "Watson", "Rajat", "IBM_EDA",
       "Freescale", "Sandia", "Bomhof", "Hamrle", "Langemyr", "Marini",
       "Oracle", "ATandT", "NYPA", "Dattorro", "Puri", "CPM", "Shen",
       "Nemeth", "UTEP", "TOKAMAK", "Averous"}


def load_groups():
    groups = {}
    with open(os.path.join(REF, "download_suiteSparse_dataset.sh")) as f:
        for m in re.finditer(r"MM/([A-Za-z0-9_-]+)/([A-Za-z0-9._-]+)\.tar\.gz",
                             f.read()):
            groups[m.group(2)] = m.group(1)
    return groups


def regime_of(group: str, m: int, n: int, nnz: int) -> str:
    if group in GRAPH:
        return "graph"
    if group in MESH:
        return "mesh"
    if group in OPT:
        return "opt"
    # default by shape: square + low avg degree variance -> mesh-ish;
    # fall back on opt (blocked irregular)
    return "opt" if m != n else "mesh"


def load_structure_stats():
    """Per-matrix 16x16-tile structure stats from the reference's own
    BSMR run (K=128, alpha=0.3, delta=0.3 log): dense coverage =
    numDenseData / NNZ and the average dense-block density — the
    fidelity targets the replica generators are validated against
    (tests/test_harness.py::test_opt_replica_structure_fidelity)."""
    path = os.path.join(REF, "results_suiteSparse_dataset/BSMR_results",
                        "BSMR_k_128_a_0.3_d_0.3.log")
    stats = {}
    cur = {}
    name = None
    with open(path, errors="replace") as f:
        for line in f:
            m = re.match(r"\[File : .*/([^/]+)\.mtx\]", line.strip())
            if m:
                name = m.group(1)
                cur = {}
                continue
            for key in ("NNZ", "bsmr_numDenseData", "bsmr_averageDensity"):
                m = re.search(rf"\[{key} : ([0-9.eE+-]+)\]", line)
                if m:
                    cur[key] = float(m.group(1))
            if name and len(cur) == 3:
                cov = cur["bsmr_numDenseData"] / max(cur["NNZ"], 1)
                stats[name] = (round(cov, 4),
                               round(cur["bsmr_averageDensity"], 4))
                name = None
    return stats


def main():
    groups = load_groups()
    stats = load_structure_stats()
    rows = {}
    for k in (32, 64, 128, 256):
        path = os.path.join(REF, f"results_suiteSparse_dataset/k{k}",
                            f"results_{k}.csv")
        with open(path) as f:
            for rec in csv.DictReader(f):
                name = rec["file"].rsplit("/", 1)[-1].removesuffix(".mtx")
                r = rows.setdefault(name, {
                    "name": name,
                    "group": groups.get(name, ""),
                    "M": int(rec["M"]), "N": int(rec["N"]),
                    "NNZ": int(rec["NNZ"]),
                })
                r[f"ref_bsmr_gflops_k{k}"] = float(rec["BSMR"])
    out = sorted(rows.values(), key=lambda r: r["NNZ"])
    for r in out:
        r["regime"] = regime_of(r["group"], r["M"], r["N"], r["NNZ"])
        if r["name"] in stats:
            r["ref_dense_coverage"], r["ref_avg_density"] = \
                stats[r["name"]]
    os.makedirs("bsmr_sddmm_tpu/data", exist_ok=True)
    cols = ["name", "group", "regime", "M", "N", "NNZ",
            "ref_bsmr_gflops_k32", "ref_bsmr_gflops_k64",
            "ref_bsmr_gflops_k128", "ref_bsmr_gflops_k256",
            "ref_dense_coverage", "ref_avg_density"]
    with open("bsmr_sddmm_tpu/data/suitesparse_replicas.csv", "w",
              newline="") as f:
        w = csv.DictWriter(f, fieldnames=cols)
        w.writeheader()
        for r in out:
            w.writerow({c: r.get(c, "") for c in cols})
    from collections import Counter
    print(len(out), "matrices;", Counter(r["regime"] for r in out))
    print("unmapped groups:", Counter(r["group"] for r in out
                                      if r["regime"] == "opt"
                                      and r["group"] not in OPT).most_common(12))


if __name__ == "__main__":
    main()
