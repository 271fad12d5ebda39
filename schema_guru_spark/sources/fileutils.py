"""Guarded file writes — K4 of SURVEY.md §2 (FileUtils.scala:39-98).

The reference refuses to overwrite a generated file whose on-disk
content differs from what it is about to write (the file "probably was
modified manually"), unless --force. The comparison ignores blank lines
and SQL comment lines (starting with ``--``), so regenerated files that
differ only in comments/whitespace count as unchanged.
"""

from __future__ import annotations

import os
from typing import Tuple


def _significant_lines(text: str) -> list:
    """Trimmed, non-empty, non-SQL-comment lines
    (FileUtils.scala:39-55)."""
    out = []
    for line in text.split("\n"):
        s = line.strip()
        if s and not s.startswith("--"):
            out.append(s)
    return out


def is_new_content(path: str, content: str) -> bool:
    """True when the file's significant content differs from ``content``
    or the file is unreadable (FileUtils.scala:39-60)."""
    try:
        with open(path) as f:
            old = _significant_lines(f.read())
    except OSError:
        return True
    return old != _significant_lines(content)


def write_to_file(file_name: str, file_dir: str, content: str,
                  force: bool = False) -> Tuple[bool, str]:
    """Guarded write (FileUtils.scala:70-98): create if absent; refuse
    to clobber manual edits without ``force``; report 'not modified'
    when the significant content already matches.

    Returns (ok, message) — the reference's Validation[String, String]
    as a plain pair. A trailing newline is appended like the
    reference's ``println``.
    """
    path = os.path.join(file_dir, file_name)
    try:
        os.makedirs(file_dir, exist_ok=True)
    except OSError:
        return (False,
                "Could not make new directory to store files in - "
                "Check write permissions")
    try:
        if not os.path.exists(path):
            with open(path, "w") as f:
                f.write(content + "\n")
            return True, f"File [{os.path.abspath(path)}] was written successfully!"
        if is_new_content(path, content):
            if not force:
                return (False,
                        f"File [{os.path.abspath(path)}] already exists and "
                        "probably was modified manually. You can use --force "
                        "to override")
            with open(path, "w") as f:
                f.write(content + "\n")
            return True, f"File [{os.path.abspath(path)}] was overriden successfully!"
        return True, f"File [{os.path.abspath(path)}] was not modified"
    except OSError as e:
        return False, f"File [{path}] failed to write: [{e}]"
