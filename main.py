"""Entry point (reference: main.py).

Usage: python main.py [G101|G201|G102|G202|G301|G302]   (default: G202)
"""

import sys

from deflatedmlmc_schwinger_tpu.utils import jaxcache

jaxcache.enable()

from deflatedmlmc_schwinger_tpu import gateway

if __name__ == "__main__":
    name = sys.argv[1] if len(sys.argv) > 1 else "G202"
    fn = getattr(gateway, name, None)
    if fn is None:
        raise SystemExit(f"unknown experiment {name!r}; choose G101/G201/G102/G202/G301/G302")
    fn()
