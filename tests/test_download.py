"""Downloader tests (scripts/download/*.sh + updateTaxonomy.sh parity).

All network I/O runs against a localhost fixture HTTP server — the flows
are identical to production except `base_url`; nothing leaves the machine.
"""

import gzip
import io
import os
import tarfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from jn_cuclark_tpu import download
from jn_cuclark_tpu.download import (
    DownloadError,
    fetch,
    parse_assembly_summary,
    rewrite_ftp,
)

DMP_NAMES = download.TAXDUMP_MEMBERS


class _Handler(BaseHTTPRequestHandler):
    """Serves `server.docroot` (a dict path → bytes); honors Range
    requests when `server.support_range`; counts Range hits."""

    def do_GET(self):  # noqa: N802
        data = self.server.docroot.get(self.path.lstrip("/"))
        if data is None:
            self.send_error(404)
            return
        rng = self.headers.get("Range")
        if rng and self.server.support_range:
            start = int(rng.split("=")[1].rstrip("-").split("-")[0])
            self.server.range_hits += 1
            body = data[start:]
            self.send_response(206)
            self.send_header(
                "Content-Range", f"bytes {start}-{len(data) - 1}/{len(data)}"
            )
        else:
            body = data
            self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    srv.docroot = {}
    srv.support_range = True
    srv.range_hits = 0
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    srv.base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield srv
    srv.shutdown()
    t.join()


def _taxdump_bytes():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as t:
        for n in DMP_NAMES:
            data = f"content of {n}\n".encode()
            info = tarfile.TarInfo(n)
            info.size = len(data)
            t.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def _stock_taxonomy(srv):
    srv.docroot["tax/taxdump.tar.gz"] = _taxdump_bytes()
    srv.docroot["tax/accession2taxid/nucl_gb.accession2taxid.gz"] = (
        gzip.compress(b"A1\t1\tgb\n")
    )
    srv.docroot["tax/accession2taxid/nucl_wgs.accession2taxid.gz"] = (
        gzip.compress(b"A2\t2\twgs\n")
    )


def test_fetch_basic_and_nc(server, tmp_path):
    server.docroot["f.txt"] = b"hello"
    dest = str(tmp_path / "f.txt")
    assert fetch(f"{server.base}/f.txt", dest) == dest
    assert open(dest, "rb").read() == b"hello"
    # wget -nc semantics: an existing complete file is not re-fetched
    server.docroot["f.txt"] = b"changed"
    fetch(f"{server.base}/f.txt", dest)
    assert open(dest, "rb").read() == b"hello"


def test_fetch_resume_range(server, tmp_path):
    server.docroot["big.bin"] = bytes(range(256)) * 64
    dest = str(tmp_path / "big.bin")
    with open(dest + ".part", "wb") as f:
        f.write(server.docroot["big.bin"][:1000])
    fetch(f"{server.base}/big.bin", dest)
    assert open(dest, "rb").read() == server.docroot["big.bin"]
    assert server.range_hits == 1


def test_fetch_restart_without_range_support(server, tmp_path):
    server.support_range = False
    server.docroot["big.bin"] = b"x" * 4096
    dest = str(tmp_path / "big.bin")
    with open(dest + ".part", "wb") as f:
        f.write(b"GARBAGE")
    fetch(f"{server.base}/big.bin", dest)
    assert open(dest, "rb").read() == server.docroot["big.bin"]


def test_fetch_404_raises(server, tmp_path):
    with pytest.raises(DownloadError):
        fetch(f"{server.base}/absent", str(tmp_path / "x"), retries=2)


def test_rewrite_ftp():
    assert (
        rewrite_ftp("ftp://ftp.ncbi.nih.gov/pub/taxonomy/taxdump.tar.gz")
        == "https://ftp.ncbi.nih.gov/pub/taxonomy/taxdump.tar.gz"
    )
    assert rewrite_ftp("http://x/y") == "http://x/y"


def test_download_taxonomy_end_to_end(server, tmp_path):
    """download_taxondata.sh:42-62: fetch, extract, concatenate gb-then-wgs
    into nucl_accss, touch ../.taxondata."""
    _stock_taxonomy(server)
    db = tmp_path / "db"
    tax = db / "taxonomy"
    download.download_taxonomy(str(tax), base_url=f"{server.base}/tax", log=lambda *a: None)
    for n in DMP_NAMES:
        assert (tax / n).read_text() == f"content of {n}\n"
    assert (tax / "nucl_accss").read_text() == "A1\t1\tgb\nA2\t2\twgs\n"
    assert (db / ".taxondata").exists()


def test_cli_download_taxonomy(server, tmp_path, capsys):
    from jn_cuclark_tpu import cli

    _stock_taxonomy(server)
    db = tmp_path / "db"
    db.mkdir()
    rc = cli.main([
        "db", "download-taxonomy", str(db), "--base-url", f"{server.base}/tax"
    ])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "All taxonomy files present." in out
    assert (db / "taxonomy" / "nucl_accss").exists()

    # unreachable payload → reference's failure message, exit 1
    db2 = tmp_path / "db2"
    db2.mkdir()
    rc = cli.main([
        "db", "download-taxonomy", str(db2), "--base-url", f"{server.base}/nope"
    ])
    out = capsys.readouterr().out
    assert rc == 1 and "Failed to download taxonomy data!" in out


SUMMARY = (
    "#   See ftp://ftp.ncbi.nlm.nih.gov/genomes/README_assembly_summary.txt\n"
    "# assembly_accession\tbioproject\tbiosample\twgs_master\trefseq_category"
    "\ttaxid\tspecies_taxid\torganism_name\tinfraspecific_name\tisolate"
    "\tversion_status\tassembly_level\trelease_type\tgenome_rep\tseq_rel_date"
    "\tasm_name\tsubmitter\tgbrs_paired_asm\tpaired_asm_comp\tftp_path\n"
)


def _summary_row(acc, status, level, ftp):
    cols = [acc, "", "", "", "", "7", "7", f"org {acc}", "", "",
            status, level, "Major", "Full", "2024/01/01", f"asm_{acc}",
            "lab", "", "", ftp]
    return "\t".join(cols) + "\n"


def test_parse_assembly_summary():
    """awk '$12=="Complete Genome" && $11=="latest"{print $20}' parity."""
    text = (
        SUMMARY
        + _summary_row("GCF_1.1", "latest", "Complete Genome", "ftp://h/g/GCF_1.1_a")
        + _summary_row("GCF_2.1", "latest", "Contig", "ftp://h/g/GCF_2.1_a")
        + _summary_row("GCF_3.1", "replaced", "Complete Genome", "ftp://h/g/GCF_3.1_a")
        + _summary_row("GCF_4.1", "latest", "Complete Genome", "na")
    )
    assert parse_assembly_summary(text) == [
        "ftp://h/g/GCF_1.1_a/GCF_1.1_a_genomic.fna.gz"
    ]


def test_download_genomes_end_to_end(server, tmp_path, capsys):
    """download_data_newest.sh: assembly_summary filter → fetch each
    *_genomic.fna.gz → gunzip → .{group} manifest; idempotent re-run."""
    fna1 = b">chr1 Escherichia\nACGTACGT\n"
    fna2 = b">chr1 Salmonella\nGGGGCCCC\n"
    rows = []
    for i, fna in ((1, fna1), (2, fna2)):
        asm = f"GCF_{i}.1_asm"
        server.docroot[f"all/{asm}/{asm}_genomic.fna.gz"] = gzip.compress(fna)
        rows.append(_summary_row(
            f"GCF_{i}.1", "latest", "Complete Genome",
            f"{server.base}/all/{asm}",
        ))
    rows.append(_summary_row("GCF_9.1", "latest", "Scaffold",
                             f"{server.base}/all/GCF_9.1_asm"))
    server.docroot["refseq/bacteria/assembly_summary.txt"] = (
        SUMMARY + "".join(rows)
    ).encode()

    dest = tmp_path / "seqs"
    dest.mkdir()
    manifest = download.download_genomes(
        str(dest), "bacteria", base_url=f"{server.base}/refseq",
        log=lambda *a: None,
    )
    paths = [ln.strip() for ln in open(manifest) if not ln.startswith("#")]
    assert len(paths) == 2
    assert all(p.startswith(str(dest / "Bacteria")) for p in paths)
    contents = sorted(open(p, "rb").read() for p in paths)
    assert contents == sorted([fna1, fna2])
    assert not any(f.endswith(".gz") for f in os.listdir(dest / "Bacteria")
                   if f.startswith("GCF"))

    # second run: "already in" skip (download_data_newest.sh:66)
    server.docroot.clear()
    again = download.download_genomes(
        str(dest), "bacteria", base_url=f"{server.base}/refseq",
        log=lambda *a: None,
    )
    assert again == manifest


def test_download_genomes_limit_and_errors(server, tmp_path):
    asm = "GCF_1.1_asm"
    server.docroot[f"all/{asm}/{asm}_genomic.fna.gz"] = gzip.compress(b">c\nAC\n")
    server.docroot["refseq/viral/assembly_summary.txt"] = (
        SUMMARY
        + _summary_row("GCF_1.1", "latest", "Complete Genome",
                       f"{server.base}/all/{asm}")
        + _summary_row("GCF_2.1", "latest", "Complete Genome",
                       f"{server.base}/all/GCF_2.1_asm")
    ).encode()
    dest = tmp_path / "seqs"
    dest.mkdir()
    # "viruses" maps to RefSeq's viral/ path and a Viruses/ directory
    manifest = download.download_genomes(
        str(dest), "viruses", base_url=f"{server.base}/refseq", limit=1,
        log=lambda *a: None,
    )
    lines = open(manifest).read().splitlines()
    assert len([ln for ln in lines if not ln.startswith("#")]) == 1
    assert any("truncated" in ln for ln in lines)
    assert (dest / "Viruses").is_dir()

    with pytest.raises(DownloadError, match="exists in RefSeq"):
        download.download_genomes(
            str(tmp_path / "other"), "nosuchgroup",
            base_url=f"{server.base}/refseq", log=lambda *a: None,
        )
