"""Training-data / model bootstrap from Google Drive.

Equivalent of the reference's utils/google_drive.py:7-66 (folder listing,
recursive download). The googleapiclient dependency is optional and gated;
everything else in the framework works without it.
"""
from __future__ import annotations

import io
import os
from typing import List, Optional

__all__ = ["get_folder_contents", "download_file", "download_files_in_folder"]


def _drive_service(credentials=None):
    try:
        from googleapiclient.discovery import build
    except ImportError as e:
        raise ImportError(
            "google-api-python-client is required for Drive bootstrap; "
            "install it or download the data manually.") from e
    return build("drive", "v3", credentials=credentials)


def get_folder_contents(folder_id: str, service=None,
                        credentials=None) -> List[dict]:
    """List {id, name, mimeType} entries of a Drive folder."""
    service = service or _drive_service(credentials)
    files: List[dict] = []
    token: Optional[str] = None
    while True:
        resp = service.files().list(
            q=f"'{folder_id}' in parents and trashed = false",
            fields="nextPageToken, files(id, name, mimeType)",
            pageToken=token).execute()
        files.extend(resp.get("files", []))
        token = resp.get("nextPageToken")
        if token is None:
            return files


def download_file(file_id: str, destination: str, service=None,
                  credentials=None, verbose: bool = False):
    from googleapiclient.http import MediaIoBaseDownload
    service = service or _drive_service(credentials)
    request = service.files().get_media(fileId=file_id)
    os.makedirs(os.path.dirname(os.path.abspath(destination)), exist_ok=True)
    with io.FileIO(destination, "wb") as fh:
        downloader = MediaIoBaseDownload(fh, request)
        done = False
        while not done:
            status, done = downloader.next_chunk()
            if verbose and status:
                print(f"{destination}: {int(status.progress() * 100)}%")


def download_files_in_folder(folder_id: str, destination: str, service=None,
                             credentials=None, recursive: bool = True,
                             skip_existing: bool = True,
                             verbose: bool = False):
    """Mirror a Drive folder locally (recursing into subfolders)."""
    service = service or _drive_service(credentials)
    os.makedirs(destination, exist_ok=True)
    for entry in get_folder_contents(folder_id, service=service):
        target = os.path.join(destination, entry["name"])
        if entry["mimeType"] == "application/vnd.google-apps.folder":
            if recursive:
                download_files_in_folder(entry["id"], target, service=service,
                                         skip_existing=skip_existing,
                                         verbose=verbose)
            continue
        if skip_existing and os.path.exists(target):
            if verbose:
                print(f"skip existing {target}")
            continue
        download_file(entry["id"], target, service=service, verbose=verbose)
