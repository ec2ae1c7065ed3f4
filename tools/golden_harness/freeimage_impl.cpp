// Minimal REAL FreeImage backend for the golden harness (replaces
// freeimage_stubs.cpp in builds that load image textures, e.g.
// makeTestSphereTextureScene's gfx/earth.jpg).
//
// FreeImage itself is not in this image, and the reference's
// lib/include/FreeImage.h declares FIBITMAP as { void *data; } — so
// the handle layout is ours to define. FreeImage_Load reads a
// pre-decoded "<filename>.raw" (int32 w, int32 h, then h TOP-DOWN rows
// of w RGB bytes) produced at harness build time by Python/imageio
// (see build_earth.sh). Scanline order follows real FreeImage: y = 0
// is the BOTTOM row, which is what LoadedTexture's v -> y mapping was
// written against (Texture.cpp:161-185).
//
// Only the FIT_BITMAP (8-bit RGB) surface the reference touches is
// implemented; everything else aborts loudly like the stubs.
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include "FreeImage.h"

#define STUB (fprintf(stderr, "FreeImage stub called\n"), abort())

namespace {
struct Bits {
    int w, h;
    // pixels follow the header in the same malloc block, BOTTOM-UP
    unsigned char *rgb() { return reinterpret_cast<unsigned char *>(this + 1); }
};
Bits *bits(FIBITMAP *b) { return static_cast<Bits *>(b->data); }
FIBITMAP *make_bitmap(int w, int h) {
    FIBITMAP *fb = static_cast<FIBITMAP *>(malloc(sizeof(FIBITMAP)));
    Bits *d = static_cast<Bits *>(
        malloc(sizeof(Bits) + static_cast<size_t>(w) * h * 3));
    d->w = w;
    d->h = h;
    memset(d->rgb(), 0, static_cast<size_t>(w) * h * 3);
    fb->data = d;
    return fb;
}
}  // namespace

extern "C" {
void DLL_CALLCONV FreeImage_Initialise(BOOL) {}
void DLL_CALLCONV FreeImage_DeInitialise() {}

FREE_IMAGE_FORMAT DLL_CALLCONV FreeImage_GetFileType(const char *, int) {
    return FIF_JPEG;  // any value != FIF_UNKNOWN; Load ignores it
}

FIBITMAP *DLL_CALLCONV FreeImage_Load(FREE_IMAGE_FORMAT, const char *fn,
                                      int) {
    char path[1024];
    snprintf(path, sizeof path, "%s.raw", fn);
    FILE *f = fopen(path, "rb");
    if (!f) {
        fprintf(stderr, "freeimage_impl: missing %s (run the raw "
                        "pre-decode step in build_earth.sh)\n", path);
        abort();
    }
    int wh[2];
    if (fread(wh, sizeof(int), 2, f) != 2) abort();
    FIBITMAP *fb = make_bitmap(wh[0], wh[1]);
    Bits *d = bits(fb);
    // file rows are TOP-DOWN; store bottom-up like real FreeImage
    for (int row = 0; row < d->h; ++row) {
        unsigned char *dst = d->rgb()
            + static_cast<size_t>(d->h - 1 - row) * d->w * 3;
        if (fread(dst, 1, static_cast<size_t>(d->w) * 3, f)
            != static_cast<size_t>(d->w) * 3) abort();
    }
    fclose(f);
    return fb;
}

FREE_IMAGE_TYPE DLL_CALLCONV FreeImage_GetImageType(FIBITMAP *) {
    return FIT_BITMAP;
}
unsigned DLL_CALLCONV FreeImage_GetWidth(FIBITMAP *b) { return bits(b)->w; }
unsigned DLL_CALLCONV FreeImage_GetHeight(FIBITMAP *b) { return bits(b)->h; }
unsigned DLL_CALLCONV FreeImage_GetBPP(FIBITMAP *) { return 24; }

FIBITMAP *DLL_CALLCONV FreeImage_AllocateT(FREE_IMAGE_TYPE t, int w, int h,
                                           int, unsigned, unsigned,
                                           unsigned) {
    if (t != FIT_BITMAP) STUB;
    return make_bitmap(w, h);
}

FIBITMAP *DLL_CALLCONV FreeImage_Copy(FIBITMAP *, int, int, int, int) {
    STUB;
}
FIBITMAP *DLL_CALLCONV FreeImage_Rescale(FIBITMAP *, int, int,
                                         FREE_IMAGE_FILTER) {
    STUB;
}

BOOL DLL_CALLCONV FreeImage_GetPixelColor(FIBITMAP *b, unsigned x,
                                          unsigned y, RGBQUAD *q) {
    // Real FreeImage returns FALSE out of bounds, leaving *q
    // UNINITIALIZED — which LoadedTexture::getPixel then reads
    // (Texture.cpp:141-146) for the out-of-[0,1) texture coordinates
    // TexturedSphere.obj contains. Define that unreproducible
    // behavior as texture WRAPAROUND instead (the Python renderer's
    // image_lookup matches it exactly).
    Bits *d = bits(b);
    long xi = static_cast<long>(static_cast<int>(x)) % d->w;
    long yi = static_cast<long>(static_cast<int>(y)) % d->h;
    if (xi < 0) xi += d->w;
    if (yi < 0) yi += d->h;
    unsigned char *p = d->rgb() + (static_cast<size_t>(yi) * d->w + xi) * 3;
    q->rgbRed = p[0];
    q->rgbGreen = p[1];
    q->rgbBlue = p[2];
    q->rgbReserved = 0;
    return 1;
}

BOOL DLL_CALLCONV FreeImage_SetPixelColor(FIBITMAP *b, unsigned x,
                                          unsigned y, RGBQUAD *q) {
    Bits *d = bits(b);
    if (x >= static_cast<unsigned>(d->w)
        || y >= static_cast<unsigned>(d->h))
        return 0;
    unsigned char *p = d->rgb() + (static_cast<size_t>(y) * d->w + x) * 3;
    p[0] = q->rgbRed;
    p[1] = q->rgbGreen;
    p[2] = q->rgbBlue;
    return 1;
}

BYTE *DLL_CALLCONV FreeImage_GetScanLine(FIBITMAP *, int) { STUB; }
}
