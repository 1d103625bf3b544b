import pyarrow as pa
import pyarrow.parquet as pq
import random

random.seed(7)
texts = [
    "", " ", "\t\t", "   \t \n  ",
    "solo",
    "a b a b a b a b",
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy dog",   # exact dup
    "the quick brown fox jumps over the lazy cat",   # near dup
    "word\x0btab word",                              # vertical tab edge
    "café naïve résumé über",
    "中文 分词 测试 中文 分词",  # CJK
    "mixed 123 text-with punct!!! and... sym@bols #here",
    "ALLCAPS TEXT WITH THE AND OF IN IS",
    "der hund und die katze das ist nicht gut",
    "el perro la casa los que una por",
    "1 2 3 4 5 6 7 8 9 10 11 12",
    "a" * 600,                                       # long single token
    ("tok " * 200).strip(),                          # 200 tokens
    "x\ty\nz\fw\rv",                                 # every whitespace kind
    # PII / repetition adversaria (q42/q43 cross-engine parity)
    "mail a.b%c@ex-ample.co.uk and x@y.io; ip 10.0.0.1, id 123456789012",
    "dots 1.2.3.4.5 short@x.a run 12345678 then 999999999",
    "a@b@c.com 256.300.1.2 +-_%@tld.xyz",            # regex corner cases
    "dup line\ndup line\ndup line\nuniq",
    "x y x y x y x y x y",                           # heavy bigram repetition
    "line\n\n\nline\n",                              # empty lines + trailing \n
    # Astral-plane adversaria (code-point vs UTF-16 unit indexing:
    # substr/length/chunking/simhash/byte-histogram parity)
    "emoji 😀😀 mix 🚀 end",
    "𝔘𝔫𝔦𝔠𝔬𝔡𝔢 𝕞𝕒𝕥𝕙 𝒮𝒸𝓇𝒾𝓅𝓉 letters",
    "💯" * 450,                                      # long astral run (chunk boundary)
    "flags 🇺🇳 🇪🇺 and zwj 👩‍🚀 sequence",
    "mixed 中文 😀 ascii λ δ 𝓍",
]
vocab = ["alpha", "beta", "gamma", "the", "and", "déjà", "中文", "42", "x!"]
while len(texts) < 60:
    n = random.randint(0, 12)
    sep = random.choice([" ", "  ", " \t "])
    texts.append(sep.join(random.choice(vocab) for _ in range(n)))
langs = [random.choice(["en", "de", "es", "fr", "zh"]) for _ in texts]
tbl = pa.table({
    "doc_id": pa.array(range(len(texts)), pa.int64()),
    "text": pa.array(texts, pa.string()),
    "lang": pa.array(langs, pa.string()),
    "source": pa.array([f"src{i % 5}" for i in range(len(texts))], pa.string()),
    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
})
pq.write_table(tbl, "/tmp/fuzz_sf/documents.parquet")
print("fuzz docs:", len(texts))

# Usage (cross-engine fuzz of the text operators):
#   mkdir -p /tmp/fuzz_sf && cd /tmp/fuzz_sf
#   for t in region nation customer supplier part orders lineitem events \
#       embeddings; do ln -sf /root/testdata/sf0.001/$t.parquet .; done
#   python3 tools/make_fuzz_documents.py     # writes documents.parquet
#   sbt "runMain graft.Verify /tmp/fuzz_sf /tmp/fuzz_out"
#   python3 tools/oracle_check.py /tmp/fuzz_sf /tmp/fuzz_out
