"""Synthetic bacterial population generator for end-to-end tests.

The reference tests run against a bundled 28-genome S. pneumoniae dataset
(test/example_set.tar.bz2 — not present in this checkout), so we simulate an
equivalent population instead: strains share an ancestor, genomes within a
strain are lightly mutated copies, strains are more diverged, and an
accessory gene pool creates core/accessory separation in the 2-D distance
cloud — the structure every PopPUNK model fit expects.
"""

import os

import numpy as np

_BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def _mutate(codes, rate, rng):
    out = codes.copy()
    pos = rng.random(out.shape[0]) < rate
    n = int(pos.sum())
    out[pos] = (out[pos] + rng.integers(1, 4, n)) % 4
    return out


class SyntheticPopulation:
    def __init__(self, n_strains=4, genomes_per_strain=(5, 4, 3, 3),
                 genome_length=100_000, core_mutation_rate=0.005,
                 between_divergence=0.03, accessory_pool=30,
                 accessory_gene_len=2_000, seed=1):
        rng = np.random.default_rng(seed)
        ancestor = rng.integers(0, 4, genome_length).astype(np.uint8)
        gene_pool = [
            rng.integers(0, 4, accessory_gene_len).astype(np.uint8)
            for _ in range(accessory_pool)
        ]

        self.names = []
        self.genomes = []
        self.strain_of = {}
        for s in range(n_strains):
            strain_root = _mutate(ancestor, between_divergence, rng)
            # each strain carries a characteristic subset of accessory genes
            strain_genes = rng.random(accessory_pool) < 0.5
            for g in range(genomes_per_strain[s]):
                genome = _mutate(strain_root, core_mutation_rate, rng)
                # within-strain accessory jitter: flip a couple of genes
                genes = strain_genes.copy()
                flip = rng.integers(0, accessory_pool, 2)
                genes[flip] = ~genes[flip]
                parts = [genome] + [gene_pool[i] for i in np.flatnonzero(genes)]
                name = f"strain{s}_iso{g}"
                self.names.append(name)
                self.genomes.append(np.concatenate(parts))
                self.strain_of[name] = s

    def write_fastas(self, directory, line_len=70):
        """Write one FASTA per genome + an rfile; returns the rfile path."""
        directory = str(directory)
        os.makedirs(directory, exist_ok=True)
        rfile = os.path.join(directory, "rfile.txt")
        with open(rfile, "w") as rf:
            for name, genome in zip(self.names, self.genomes):
                path = os.path.join(directory, name + ".fa")
                seq = _BASES[genome].tobytes().decode()
                with open(path, "w") as f:
                    f.write(f">{name}\n")
                    for i in range(0, len(seq), line_len):
                        f.write(seq[i : i + line_len] + "\n")
                rf.write(f"{name}\t{path}\n")
        return rfile

    def subset_rfile(self, directory, names, fname):
        directory = str(directory)
        rfile = os.path.join(directory, fname)
        with open(rfile, "w") as rf:
            for name in names:
                rf.write(f"{name}\t{os.path.join(directory, name + '.fa')}\n")
        return rfile
