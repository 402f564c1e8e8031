"""Clustering CLI — drop-in equivalent of the reference cluster.py."""
from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Cluster predicted structures (glocon / tmscore / rmsd)")
    p.add_argument("--pdb_dir", "-d", required=True, type=str)
    p.add_argument("--mode", "-m", choices=["glocon", "tmscore", "rmsd"],
                   default="glocon")
    p.add_argument("--output_dir", "-o", type=str, default=None)
    p.add_argument("--n_clusters", type=int, default=10)
    p.add_argument("--n_files", type=int, default=5)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from trx2dy.analysis.cluster import save_cluster_result

    output_dir = args.output_dir or os.path.join(args.pdb_dir,
                                                 "clusters_result")
    os.makedirs(output_dir, exist_ok=True)
    result = save_cluster_result(args.pdb_dir, n_clusters=args.n_clusters,
                                 n_files=args.n_files, output_dir=output_dir,
                                 mode=args.mode)
    if result == "no_cluster":
        print("Clustering failed or not possible.")
    else:
        print(f"Clustering completed. Results saved in {output_dir}.")


if __name__ == "__main__":
    main()
