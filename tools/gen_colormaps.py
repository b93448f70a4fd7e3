"""Generate OpenCV colormap LUTs as .npy assets (run once, commit the output).

The reference uses cv2.applyColorMap with COLORMAP_JET (streamline field
visualizations, ripcurrents_module.cpp:13-40) and COLORMAP_RAINBOW
(get_streamlines composite, ripcurrents_module.cpp:77). We snapshot the
256x3 BGR LUTs from opencv-python so the runtime needs no cv2 dependency
and matches the reference bit-for-bit.
"""

import os

import cv2
import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "ripcurrents_tpu", "assets")


def main():
    os.makedirs(OUT, exist_ok=True)
    ramp = np.arange(256, dtype=np.uint8).reshape(256, 1)
    for name, cmap in [("jet", cv2.COLORMAP_JET), ("rainbow", cv2.COLORMAP_RAINBOW)]:
        lut = cv2.applyColorMap(ramp, cmap).reshape(256, 3)  # BGR
        np.save(os.path.join(OUT, f"colormap_{name}.npy"), lut)
        print(name, lut[:3], lut[-3:])


if __name__ == "__main__":
    main()
