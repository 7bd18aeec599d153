"""Filename sanitization, extension extraction, ordinal naming rules.

Reproduces the reference's two *conflicting* naming conventions exactly
(SURVEY.md X5/X6/W1/A1):

- sanitize:        upload.ts:524-537 (= images.ts:23-36)
- webapp ordinal:  upload.ts:679-708 — first member bare, member i>0 gets
  ``_{i+1}``; extension = last-dot ``path.extname``
- notebook ordinal: rename_photos.ipynb cell 4 ``generate_new_filenames`` —
  every member numbered ``_{n}`` starting at 1; extension = everything
  after the *first* dot, defaulting to 'jpg'
"""

from __future__ import annotations

import re

_WS = re.compile(r"\s+")
_BAD = re.compile(r'[<>:"/\\|?*]')
_MULTI_UNDERSCORE = re.compile(r"_+")
_EDGE_UNDERSCORE = re.compile(r"^_+|_+$")


def sanitize_filename(name: str) -> str:
    """upload.ts:524-537, step for step."""
    s = name.strip()
    s = _WS.sub("_", s)
    s = _BAD.sub("", s)
    s = _MULTI_UNDERSCORE.sub("_", s)
    s = _EDGE_UNDERSCORE.sub("", s)
    return s or "untitled"


def ext_last_dot(name: str) -> str:
    """Node ``path.extname`` semantics (upload.ts:680): '' if no dot or the
    only dot is leading; includes the dot."""
    base = name.rsplit("/", 1)[-1]
    idx = base.rfind(".")
    if idx <= 0:  # -1 no dot; 0 dotfile → extname is ''
        return ""
    return base[idx:]


def ext_first_dot(name: str) -> str:
    """Notebook rule (rename_photos.ipynb cell 4): everything after the
    FIRST dot, default 'jpg'; no leading dot in the return."""
    base = name.rsplit("/", 1)[-1]
    parts = base.split(".", 1)
    return parts[1] if len(parts) == 2 and parts[1] else "jpg"


def webapp_ordinal_name(group: str, index0: int, original_name: str) -> str:
    """upload.ts:697-702: index 0 bare, index i>0 → ``_{i+1}``."""
    suffix = f"_{index0 + 1}" if index0 > 0 else ""
    return f"{sanitize_filename(group)}{suffix}{ext_last_dot(original_name)}"


def notebook_ordinal_name(group: str, ordinal1: int, original_name: str) -> str:
    """rename_photos.ipynb cell 4: every member ``{group}_{n}.{first-dot ext}``."""
    return f"{group}_{ordinal1}.{ext_first_dot(original_name)}"
