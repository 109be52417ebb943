"""``python -m depthrenderer_tpu.native.build`` — compile the native frame ops."""

from . import build, available

if __name__ == "__main__":
    ok = build(force=True)
    print("native frameops:", "built" if ok else "BUILD FAILED (falling back to Pillow)")
    print("available:", available())
