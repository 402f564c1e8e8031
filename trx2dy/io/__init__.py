from trx2dy.io.a3m import parse_a3m, read_fasta, ALPHABET, seq_to_ints
from trx2dy.io.pdbio import write_pdb_backbone, read_pdb_backbone
