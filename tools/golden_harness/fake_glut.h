// Fake GLUT/GL header for headless NO_GFX builds of the reference.
// All calls are no-ops; the NO_GFX path never renders GL.
#ifndef FAKE_GLUT_H
#define FAKE_GLUT_H
typedef unsigned int GLenum; typedef unsigned char GLubyte;
typedef float GLfloat; typedef int GLint; typedef int GLsizei;
typedef unsigned int GLbitfield; typedef void GLvoid; typedef double GLdouble;
#define GL_BACK 0x0405
#define GL_FRONT 0x0404
#define GL_FRONT_AND_BACK 0x0408
#define GL_COLOR_BUFFER_BIT 0x4000
#define GL_DEPTH_BUFFER_BIT 0x0100
#define GL_LIGHTING 0x0B50
#define GL_LINE 0x1B01
#define GL_MODELVIEW 0x1700
#define GL_PROJECTION 0x1701
#define GL_QUADS 0x0007
#define GL_RGB 0x1907
#define GL_SMOOTH 0x1D01
#define GL_TEXTURE_2D 0x0DE1
#define GL_TRIANGLES 0x0004
#define GL_UNSIGNED_BYTE 0x1401
#define GLUT_DOUBLE 0x0002
#define GLUT_DOWN 0
#define GLUT_LEFT_BUTTON 0
#define GLUT_MIDDLE_BUTTON 1
#define GLUT_RIGHT_BUTTON 2
#define GLUT_RGB 0
static inline void glBegin(GLenum) {}
static inline void glClear(GLbitfield) {}
static inline void glClearColor(GLfloat, GLfloat, GLfloat, GLfloat) {}
static inline void glColor3f(GLfloat, GLfloat, GLfloat) {}
static inline void glDisable(GLenum) {}
static inline void glDrawBuffer(GLenum) {}
static inline void glDrawPixels(GLsizei, GLsizei, GLenum, GLenum, const void*) {}
static inline void glEnd() {}
static inline void glFinish() {}
static inline void glLoadIdentity() {}
static inline void glMatrixMode(GLenum) {}
static inline void glPolygonMode(GLenum, GLenum) {}
static inline void glPopMatrix() {}
static inline void glPushMatrix() {}
static inline void glRasterPos2f(GLfloat, GLfloat) {}
static inline void glReadPixels(GLint, GLint, GLsizei, GLsizei, GLenum, GLenum, void*) {}
static inline void glShadeModel(GLenum) {}
static inline void glTranslatef(GLfloat, GLfloat, GLfloat) {}
static inline void glVertex3f(GLfloat, GLfloat, GLfloat) {}
static inline void glViewport(GLint, GLint, GLsizei, GLsizei) {}
static inline int glutCreateWindow(const char*) { return 1; }
static inline void glutDisplayFunc(void (*)(void)) {}
static inline void glutInit(int*, char**) {}
static inline void glutInitDisplayMode(unsigned int) {}
static inline void glutInitWindowPosition(int, int) {}
static inline void glutInitWindowSize(int, int) {}
static inline void glutKeyboardFunc(void (*)(unsigned char, int, int)) {}
static inline void glutMainLoop() {}
static inline void glutMotionFunc(void (*)(int, int)) {}
static inline void glutMouseFunc(void (*)(int, int, int, int)) {}
static inline void glutPostRedisplay() {}
static inline void glutReshapeFunc(void (*)(int, int)) {}
static inline void glutSwapBuffers() {}
static inline void glutWireSphere(GLdouble, GLint, GLint) {}
#endif
static inline void gluPerspective(GLdouble, GLdouble, GLdouble, GLdouble) {}
static inline void gluLookAt(GLdouble, GLdouble, GLdouble, GLdouble, GLdouble, GLdouble, GLdouble, GLdouble, GLdouble) {}
