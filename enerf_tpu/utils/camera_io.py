"""easymocap-style camera file IO: ``intri.yml`` / ``extri.yml`` via
cv2.FileStorage (reference lib/utils/data_utils.py:623-699 read_camera /
FileStorage)."""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


def _read_string_list(fs, key: str) -> List[str]:
    node = fs.getNode(key)
    out = []
    for i in range(node.size()):
        v = node.at(i).string()
        if v == "":
            v = str(int(node.at(i).real()))
        if v != "none":
            out.append(v)
    return out


def read_camera(intri_path: str, extri_path: str,
                cam_names: Optional[List[str]] = None) -> Dict:
    """Returns {cam: {K, invK, R, T, RT, P, dist}} plus 'basenames'."""
    import cv2

    intri = cv2.FileStorage(intri_path, cv2.FILE_STORAGE_READ)
    extri = cv2.FileStorage(extri_path, cv2.FILE_STORAGE_READ)
    names = cam_names or _read_string_list(intri, "names")
    cams: Dict = {}
    for cam in names:
        K = intri.getNode(f"K_{cam}").mat()
        Rvec = extri.getNode(f"R_{cam}").mat()
        Tvec = extri.getNode(f"T_{cam}").mat()
        R = cv2.Rodrigues(Rvec)[0]
        RT = np.hstack([R, Tvec])
        cams[cam] = {
            "K": K, "invK": np.linalg.inv(K),
            "R": R, "T": Tvec, "RT": RT, "P": K @ RT,
            "dist": intri.getNode(f"dist_{cam}").mat(),
        }
    cams["basenames"] = names
    intri.release()
    extri.release()
    return cams
