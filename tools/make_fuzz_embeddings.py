"""Adversarial embeddings corpus for the ANN / PQ / quantization family.

Stresses the degenerate-and-tie paths the synthetic table never hits:
  - the ZERO vector (zero norm: cosine guards, quantization scale=0);
  - exact DUPLICATE vectors (distance ties -> id tie-breaks must agree
    cross-engine in brute-force/IVF/LSH/ADC ranking);
  - near-epsilon and huge-magnitude vectors (float->double widening,
    squared-distance overflow headroom);
  - sign-flipped pairs (cosine -1, hyperplane LSH bit flips);
  - one-hot and constant vectors (PQ block argmin ties to smallest code).

Keeps the production contract: vec_id contiguous from 0 (stride
centroids at vec_id % 25 == 0, query subset vec_id < 20, PQ codebook
from vec_id < 16), dim 64, labels int32.

Usage (mirrors make_fuzz_documents.py):
  mkdir -p /tmp/fuzz_emb && cd /tmp/fuzz_emb
  for t in region nation customer supplier part orders lineitem events \
      documents; do ln -sf /root/testdata/sf0.001/$t.parquet .; done
  python3 tools/make_fuzz_embeddings.py   # writes embeddings.parquet
  sbt "runMain graft.Verify /tmp/fuzz_emb /tmp/fuzz_emb_out"
  python3 tools/oracle_check.py /tmp/fuzz_emb /tmp/fuzz_emb_out
"""
import random
import struct

import pyarrow as pa
import pyarrow.parquet as pq

random.seed(13)
DIM = 64
N = 120

def rnd_vec(scale=1.0):
    return [struct.unpack('f', struct.pack('f', random.gauss(0, scale)))[0]
            for _ in range(DIM)]

vecs = []
for i in range(N):
    kind = i % 12
    if kind == 0 and i > 0:
        vecs.append(list(vecs[i - 1]))          # exact duplicate of predecessor
    elif kind == 1:
        vecs.append([0.0] * DIM)                # zero vector
    elif kind == 2:
        vecs.append([-x for x in vecs[i - 1]])  # sign flip of predecessor
    elif kind == 3:
        v = [0.0] * DIM
        v[i % DIM] = 1.0                        # one-hot
        vecs.append(v)
    elif kind == 4:
        vecs.append([1e-6] * DIM)               # near-epsilon constant
    elif kind == 5:
        vecs.append(rnd_vec(1e3))               # huge magnitude
    elif kind == 6:
        vecs.append([0.5] * DIM)                # constant (PQ block ties)
    else:
        vecs.append(rnd_vec())

tbl = pa.table({
    "vec_id": pa.array(range(N), pa.int64()),
    "embedding": pa.array(vecs, pa.list_(pa.float32())),
    "label": pa.array([i % 4 for i in range(N)], pa.int32()),
})
pq.write_table(tbl, "/tmp/fuzz_emb/embeddings.parquet")
print("fuzz embeddings:", N)
