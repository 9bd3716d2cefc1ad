"""GenBank FTP mirror (reference preprocessing/download_genbank.py).

Anonymous FTP download of ftp.ncbi.nih.gov/genbank/*.seq.gz with a
size-based already-complete check and bounded retry/reconnect
(download_genbank.py:5-61). The FTP factory is injectable for testing.
"""
from __future__ import annotations

import ftplib
import os
import time
from typing import Callable, Optional


def download_seq_files(
    ftp_address: str,
    directory: str,
    file_format: str,
    dest_dir: str = ".",
    max_retries: int = 5,
    retry_delay: float = 5.0,
    ftp_factory: Optional[Callable[[str], "ftplib.FTP"]] = None,
    log=print,
) -> list:
    """Mirror all `file_format` files; returns the list downloaded."""
    make_ftp = ftp_factory or (lambda addr: ftplib.FTP(addr))
    os.makedirs(dest_dir, exist_ok=True)

    def download_file(ftp, name: str):
        local = os.path.join(dest_dir, name)
        if os.path.exists(local):
            local_size = os.path.getsize(local)
            ftp.voidcmd("TYPE I")
            remote_size = ftp.size(name)
            if local_size == remote_size:
                log(f"{name} has already been completely downloaded.")
                return False
            log(f"Downloading {name} from start (resume not supported)...")
        with open(local, "wb") as f:
            ftp.retrbinary("RETR " + name, f.write)
        return True

    downloaded = []
    ftp = make_ftp(ftp_address)
    ftp.login()
    ftp.cwd(directory)
    files = [f for f in ftp.nlst() if f.endswith(file_format)]

    for name in files:
        retries = 0
        while retries < max_retries:
            try:
                if download_file(ftp, name):
                    downloaded.append(name)
                break
            except (ftplib.error_temp, EOFError, IOError) as e:
                log(f"Error downloading {name}: {e}, retrying in "
                    f"{retry_delay} seconds...")
                time.sleep(retry_delay)
                retries += 1
                ftp = make_ftp(ftp_address)
                ftp.login()
                ftp.cwd(directory)
        if retries == max_retries:
            log(f"Failed to download {name} after {max_retries} attempts.")
    return downloaded


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description="Mirror GenBank .seq.gz via FTP")
    ap.add_argument("--ftp_address", default="ftp.ncbi.nih.gov")
    ap.add_argument("--directory", default="/genbank")
    ap.add_argument("--file_format", default=".seq.gz")
    ap.add_argument("--dest_dir", default=".")
    a = ap.parse_args()
    download_seq_files(a.ftp_address, a.directory, a.file_format, a.dest_dir)
