"""CLI parity: the reference client's transform/mask/match/estimate
command flow (pprl_client cli.py:96-563) driven end-to-end through
`python -m pprl_spark` with reference-wire-format JSON configs and CSV
files."""

import base64
import csv
import json

import pytest

from pprl_spark import cli
from pprl_spark.config import CLKFilter, HashConfig, HashFunctionConfig, MaskConfig
from pprl_spark.kernels.encode import BloomEncoder


MASK_REQUEST = {
    "config": {
        "token_size": 2,
        "hash": {
            "function": {"algorithms": ["sha256"], "key": None},
            "strategy": {"name": "double_hash"},
        },
        "prepend_attribute_name": False,
        "filter": {"type": "clk", "filter_size": 256, "hash_values": 4},
        "padding": "_",
        "hardeners": [],
    },
    "attributes": [],
}

TRANSFORM_REQUEST = {
    "config": {"empty_value": "ignore"},
    "attribute_transformers": [
        {
            "attribute_name": "name",
            "transformers": [{"name": "mapping", "mapping": {"bob": "B"}, "default_value": "X"}],
        }
    ],
    "global_transformers": {"before": [], "after": []},
}

MATCH_REQUEST = {"config": {"measure": "dice", "threshold": 0.8, "method": "crosswise"}}


def _read_csv(path):
    with open(path, newline="") as fh:
        return list(csv.DictReader(fh))


@pytest.fixture()
def workdir(tmp_path):
    (tmp_path / "mask.json").write_text(json.dumps(MASK_REQUEST))
    (tmp_path / "transform.json").write_text(json.dumps(TRANSFORM_REQUEST))
    (tmp_path / "match.json").write_text(json.dumps(MATCH_REQUEST))
    (tmp_path / "a.csv").write_text("id,name\na1,anna maria\na2,bob jones\n")
    (tmp_path / "b.csv").write_text("id,name\nb1,anna maria\nb2,quentin zulu\n")
    return tmp_path


def test_cli_mask_matches_kernel_encoding(spark, workdir):
    out = workdir / "masked_a.csv"
    cli.main(["mask", str(workdir / "mask.json"), str(workdir / "a.csv"), str(out)])
    rows = {r["id"]: r["value"] for r in _read_csv(out)}
    cfg = MaskConfig(
        filter=CLKFilter(256, 4),
        hash=HashConfig(HashFunctionConfig(("sha256",)), "double_hash"),
        token_size=2,
        padding="_",
        prepend_attribute_name=False,
    )
    enc = BloomEncoder(cfg, ["name"])
    want = enc.encode_batch_b64(["a1", "a2"], {"name": ["anna maria", "bob jones"]})
    assert [rows["a1"], rows["a2"]] == want
    # wire value round-trips through plain base64 (no MIME wraps)
    assert len(base64.b64decode(rows["a1"])) == 32


def test_cli_transform(spark, workdir):
    out = workdir / "transformed.csv"
    cli.main(["transform", str(workdir / "transform.json"), str(workdir / "a.csv"), str(out)])
    rows = {r["id"]: r["name"] for r in _read_csv(out)}
    assert rows == {"a1": "X", "a2": "X"}  # whole-value mapping, no exact hit

    (workdir / "c.csv").write_text("id,name\nc1,bob\n")
    cli.main(["transform", str(workdir / "transform.json"), str(workdir / "c.csv"), str(out)])
    assert _read_csv(out)[0]["name"] == "B"


def test_cli_match_multi_file_all_pairs(spark, workdir):
    for name in ("a", "b"):
        cli.main([
            "mask", str(workdir / "mask.json"),
            str(workdir / f"{name}.csv"), str(workdir / f"m_{name}.csv"),
        ])
    out = workdir / "matches.csv"
    cli.main([
        "match", str(workdir / "match.json"),
        str(workdir / "m_a.csv"), str(workdir / "m_b.csv"), str(out),
    ])
    rows = _read_csv(out)
    assert set(rows[0]) == {"domain_id", "domain_file", "range_id", "range_file", "similarity"}
    hits = {(r["domain_id"], r["range_id"]): float(r["similarity"]) for r in rows}
    assert hits[("a1", "b1")] == pytest.approx(1.0)  # anna maria in both files
    assert all(r["domain_file"] == "m_a.csv" and r["range_file"] == "m_b.csv" for r in rows)
    # single-file self-match mode
    out2 = workdir / "self.csv"
    cli.main(["match", str(workdir / "match.json"), str(workdir / "m_a.csv"), str(out2)])
    self_rows = _read_csv(out2)
    assert all(r["domain_id"] < r["range_id"] for r in self_rows)


def test_cli_match_duplicate_basenames_use_full_paths(spark, workdir):
    """Regression (r2 review): two parties exporting the same filename
    must not collapse into a single-file self-match."""
    for sub in ("siteA", "siteB"):
        d = workdir / sub
        d.mkdir()
    cli.main(["mask", str(workdir / "mask.json"), str(workdir / "a.csv"),
              str(workdir / "siteA" / "vectors.csv")])
    cli.main(["mask", str(workdir / "mask.json"), str(workdir / "b.csv"),
              str(workdir / "siteB" / "vectors.csv")])
    out = workdir / "collide.csv"
    cli.main(["match", str(workdir / "match.json"),
              str(workdir / "siteA" / "vectors.csv"),
              str(workdir / "siteB" / "vectors.csv"), str(out)])
    rows = _read_csv(out)
    labels = {(r["domain_file"], r["range_file"]) for r in rows}
    # cross-file match with full-path labels, one pair of distinct files
    assert len(labels) == 1
    (df_label, rf_label), = labels
    assert df_label != rf_label and "siteA" in df_label + rf_label
    assert {(r["domain_id"], r["range_id"]) for r in rows} == {("a1", "b1")}


def test_cli_estimate_writes_reference_shape(spark, workdir):
    out = workdir / "weights.json"
    cli.main(["estimate", str(workdir / "a.csv"), str(out), "-a", "name"])
    payload = json.loads(out.read_text())
    assert payload[0]["attribute_name"] == "name"
    assert payload[0]["weight"] > 0 and payload[0]["average_token_count"] > 0


def test_cli_quality_filter(spark, tmp_path):
    docs = tmp_path / "docs.csv"
    docs.write_text(
        "doc_id,text\n"
        "1,the of and to in that was for it is\n"          # 10 en stopwords
        "2,zz zz zz zz zz zz zz zz zz zz\n"                # repetitive
        "3,too short\n"
    )
    out = tmp_path / "quality.csv"
    cli.main([
        "quality", str(docs), str(out),
        "--min-tokens", "5", "--lang", "en",
        "--max-dup-word-fraction", "0.5",
    ])
    rows = {r["doc_id"]: r for r in _read_csv(str(out))}
    assert rows["1"]["keep"] == "true" and rows["1"]["reject_reason"] == "ok"
    assert rows["3"]["reject_reason"] == "too_short"
    # doc 2: all-identical non-stopword tokens -> lang 'und' fires first
    assert rows["2"]["keep"] == "false"
    assert rows["2"]["reject_reason"] in ("lang", "repetition_words")

    kept = tmp_path / "kept.csv"
    cli.main([
        "quality", str(docs), str(kept),
        "--min-tokens", "5", "--keep-only",
    ])
    assert {r["doc_id"] for r in _read_csv(str(kept))} == {"1", "2"}


def test_cli_quality_gopher_ngrams_flag(spark, tmp_path):
    docs = tmp_path / "docs2.csv"
    docs.write_text(
        "doc_id,text\n"
        "1,spam spam spam spam spam spam spam spam spam spam\n"
        "2,the of and to in that was for it is you he with on as at by "
        "this had not are but from or have an they which one were all we "
        "when your can said there use each she how their if will up other\n"
    )
    out = tmp_path / "q2.csv"
    cli.main([
        "quality", str(docs), str(out),
        "--min-tokens", "5", "--gopher-ngrams",
    ])
    rows = {r["doc_id"]: r for r in _read_csv(str(out))}
    assert rows["1"]["keep"] == "false"
    assert rows["1"]["reject_reason"].startswith("repetition_")
    assert rows["2"]["keep"] == "true"


def test_cli_sample_stratified_and_rate(spark, tmp_path):
    docs = tmp_path / "s.csv"
    docs.write_text(
        "doc_id,lang,text\n"
        + "".join(f"{i},{'en' if i % 2 else 'de'},doc {i}\n" for i in range(40))
    )
    out = tmp_path / "strat.csv"
    cli.main([
        "sample", str(docs), str(out),
        "--per-group", "lang", "-k", "3",
    ])
    rows = _read_csv(str(out))
    bylang = {}
    for r in rows:
        bylang.setdefault(r["lang"], []).append(r["sample_rank"])
    assert bylang == {"de": ["1", "2", "3"], "en": ["1", "2", "3"]}

    out2 = tmp_path / "rate.csv"
    cli.main(["sample", str(docs), str(out2), "--rate", "0.5"])
    n = len(_read_csv(str(out2)))
    assert 0 < n < 40
    # deterministic: same command, same rows
    out3 = tmp_path / "rate2.csv"
    cli.main(["sample", str(docs), str(out3), "--rate", "0.5"])
    assert [r["doc_id"] for r in _read_csv(str(out3))] == [
        r["doc_id"] for r in _read_csv(str(out2))
    ]

    with pytest.raises(ValueError, match="--per-group"):
        cli.main(["sample", str(docs), str(tmp_path / "x.csv")])
    with pytest.raises(ValueError, match="needs `missing`"):
        cli.main(["sample", str(docs), str(tmp_path / "x.csv"),
                  "--key-column", "missing", "--rate", "0.5"])


def test_cli_redact(spark, tmp_path):
    docs = tmp_path / "r.csv"
    docs.write_text(
        "doc_id,text\n"
        "1,mail a@b.io or call 555-123-4567\n"
        "2,host 10.0.0.1 ssn 123-45-6789\n"
        "3,clean\n"
    )
    out = tmp_path / "red.csv"
    cli.main(["redact", str(docs), str(out)])
    rows = {r["doc_id"]: r for r in _read_csv(str(out))}
    assert rows["1"]["text"] == "mail <email> or call <phone>"
    assert rows["1"]["pii_email"] == "1" and rows["1"]["pii_phone"] == "1"
    assert rows["2"]["text"] == "host <ipv4> ssn <ssn>"
    assert rows["3"]["text"] == "clean"

    only = tmp_path / "red2.csv"
    cli.main(["redact", str(docs), str(only),
              "--kind", "email", "--token-format", "[{kind}]"])
    rows = {r["doc_id"]: r for r in _read_csv(str(only))}
    assert rows["1"]["text"] == "mail [email] or call 555-123-4567"
    assert "pii_phone" not in rows["1"]


def test_cli_boilerplate(spark, tmp_path):
    docs = tmp_path / "b.csv"
    banner = "cookie banner line"
    docs.write_text(
        "doc_id,site,text\n"
        f'1,a.com,"{banner}\nkeep one"\n'
        f'2,a.com,"{banner}\nkeep two"\n'
        "3,b.com,other\n"
    )
    out = tmp_path / "clean.csv"
    cli.main([
        "boilerplate", str(docs), str(out),
        "--domain-column", "site", "--min-doc-fraction", "0.5",
    ])
    rows = {r["doc_id"]: r for r in _read_csv(str(out))}
    assert rows["1"]["text"] == "keep one"
    assert rows["2"]["text"] == "keep two"
    assert rows["1"]["n_lines_removed"] == "1"
    assert rows["3"]["text"] == "other"


def test_cli_ingest_warc(spark, tmp_path, capsys):
    from pprl_spark.fixtures import make_pages_local, make_warc_bytes

    rows = make_pages_local(8)
    (tmp_path / "x.warc.gz").write_bytes(make_warc_bytes(rows, gz=True))
    out = tmp_path / "pages_pq"
    cli.main(["ingest-warc", str(tmp_path / "x.warc.gz"), str(out),
              "--extract-text"])
    got = {r["url"]: r for r in spark.read.parquet(str(out)).collect()}
    assert len(got) == 8
    for r in rows:
        assert got[r["url"]]["text"] == r["text"]
        assert bytes(got[r["url"]]["html"]) == r["html"]


def test_cli_linkrank(spark, tmp_path):
    from pprl_spark.fixtures import make_pages

    src = tmp_path / "pages_pq"
    make_pages(spark, 100, partitions=2).write.parquet(str(src))
    out = tmp_path / "ranks.csv"
    cli.main(["linkrank", str(src), str(out), "--iterations", "3"])
    rows = _read_csv(str(out))
    assert len(rows) > 50  # hosts appearing in any edge
    total = sum(float(r["rank"]) for r in rows)
    assert abs(total - 1.0) < 1e-6
    # sorted by rank desc
    ranks = [float(r["rank"]) for r in rows]
    assert ranks == sorted(ranks, reverse=True)


def test_cli_sample_mixture(spark, tmp_path):
    docs = tmp_path / "m.csv"
    docs.write_text(
        "doc_id,lang,text\n"
        + "".join(
            f"{i},{'en' if i % 10 < 8 else 'de'},doc {i}\n" for i in range(200)
        )
    )
    out = tmp_path / "mix.csv"
    cli.main([
        "sample", str(docs), str(out),
        "--per-group", "lang", "--mixture-alpha", "0.0", "--rate", "0.5",
    ])
    rows = _read_csv(str(out))
    kept = {}
    for r in rows:
        kept[r["lang"]] = kept.get(r["lang"], 0) + 1
    # alpha=0 targets equal mass per group: the rare group (de, 40 docs)
    # is kept at a much higher rate than the dominant one
    assert kept["de"] / 40 > kept["en"] / 160
    with pytest.raises(ValueError, match="--rate"):
        cli.main(["sample", str(docs), str(tmp_path / "x.csv"),
                  "--per-group", "lang", "--mixture-alpha", "0.5"])


def test_cli_spans(spark, tmp_path):
    passage = "the quick brown fox jumps over the lazy dog again and again"
    docs = tmp_path / "sp.csv"
    docs.write_text(
        "doc_id,text\n"
        f'1,"intro. {passage} outro one"\n'
        f'2,"other start. {passage} different end"\n'
        '3,"entirely unrelated content with no shared passage anywhere"\n'
    )
    out = tmp_path / "spans.csv"
    cli.main(["spans", str(docs), str(out), "--k-gram", "20", "--window", "10"])
    rows = {r["doc_id"]: r for r in _read_csv(str(out))}
    assert float(rows["1"]["dup_fraction"]) > 0
    assert float(rows["2"]["dup_fraction"]) > 0
    assert float(rows["3"]["dup_fraction"]) == 0.0
    flt = tmp_path / "flt.csv"
    cli.main(["spans", str(docs), str(flt), "--k-gram", "20",
              "--window", "10", "--min-dup-fraction", "0.01"])
    assert {r["doc_id"] for r in _read_csv(str(flt))} == {"1", "2"}
