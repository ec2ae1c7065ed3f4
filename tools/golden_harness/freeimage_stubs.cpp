// Stub implementations of the FreeImage symbols the reference calls.
// Golden scenes (teapot/bunny/cornell/sphere) load no image textures,
// so these abort if reached.
#include <cstdio>
#include <cstdlib>
#include "FreeImage.h"
#define STUB (fprintf(stderr, "FreeImage stub called\n"), abort())
extern "C" {
void DLL_CALLCONV FreeImage_Initialise(BOOL) {}
void DLL_CALLCONV FreeImage_DeInitialise() {}
FREE_IMAGE_FORMAT DLL_CALLCONV FreeImage_GetFileType(const char*, int) { STUB; }
FIBITMAP* DLL_CALLCONV FreeImage_Load(FREE_IMAGE_FORMAT, const char*, int) { STUB; }
FREE_IMAGE_TYPE DLL_CALLCONV FreeImage_GetImageType(FIBITMAP*) { STUB; }
unsigned DLL_CALLCONV FreeImage_GetWidth(FIBITMAP*) { STUB; }
unsigned DLL_CALLCONV FreeImage_GetHeight(FIBITMAP*) { STUB; }
unsigned DLL_CALLCONV FreeImage_GetBPP(FIBITMAP*) { STUB; }
FIBITMAP* DLL_CALLCONV FreeImage_AllocateT(FREE_IMAGE_TYPE, int, int, int, unsigned, unsigned, unsigned) { STUB; }
FIBITMAP* DLL_CALLCONV FreeImage_Copy(FIBITMAP*, int, int, int, int) { STUB; }
FIBITMAP* DLL_CALLCONV FreeImage_Rescale(FIBITMAP*, int, int, FREE_IMAGE_FILTER) { STUB; }
BOOL DLL_CALLCONV FreeImage_GetPixelColor(FIBITMAP*, unsigned, unsigned, RGBQUAD*) { STUB; }
BOOL DLL_CALLCONV FreeImage_SetPixelColor(FIBITMAP*, unsigned, unsigned, RGBQUAD*) { STUB; }
BYTE* DLL_CALLCONV FreeImage_GetScanLine(FIBITMAP*, int) { STUB; }
}
