/* gl_groundtruth — render a DepthRenderer scene with the REAL OpenGL pipeline.
 *
 * Ground-truth generator for the BASELINE quality gate ("PSNR >= 40 dB vs the
 * OpenGL reference render"): replicates the reference application's GL usage
 * (/root/reference/DepthRenderer/render.py) on Mesa llvmpipe via EGL's
 * surfaceless platform, so the golden comes from an actual GL rasteriser +
 * sampler rather than from any code in this repository.
 *
 * Replicated reference state, line by line:
 *   - shaders: gl_Position = mvp * vec4(position, 1)  (shaders/shader.vert:13)
 *              frag = texture(colourSampler, v_texcoord) (shaders/shader.frag:8)
 *     (#version 330 core here; 460 in the reference — the referenced features
 *      are identical in both)
 *   - mvp uploaded with transpose=GL_TRUE from a row-major matrix
 *     (render.py:811-812)
 *   - GL_CULL_FACE + GL_DEPTH_TEST, black clear colour (render.py:631-634)
 *   - texture: GL_RGBA8, GL_LINEAR min/mag (render.py:357-361). Deviation:
 *     GL_CLAMP_TO_EDGE instead of the reference's legacy GL_CLAMP (invalid in
 *     core profile; differs only at the outermost half-texel when UVs leave
 *     [0,1], which the grid mesh's UVs never do).
 *   - vertices as vec3 + UVs as vec2, uint32 element indices
 *     (render.py:412-434), glDrawElements(GL_TRIANGLES) (render.py:448)
 *
 * No GL/EGL development headers exist in this image, so every prototype is
 * declared by hand against the stable EGL/GL ABI and resolved through
 * eglGetProcAddress (EGL 1.5 returns client API entry points too; Mesa does).
 *
 * Input (stdin or argv[1]): little-endian binary blob —
 *   int32 width, height, n_verts, n_indices, tex_w, tex_h
 *   float32 mvp[16]            (row-major)
 *   float32 verts[n_verts*3]
 *   float32 uvs[n_verts*2]
 *   uint32  indices[n_indices]
 *   uint8   texture[tex_h*tex_w*4]   (bottom-up, as the reference uploads it)
 * Output (argv[2]): raw RGBA8, bottom-up (GL window order), w*h*4 bytes.
 */

#include <stddef.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <time.h>
#include <string.h>

/* ---- minimal EGL ABI ---- */
typedef void *EGLDisplay;
typedef void *EGLConfig;
typedef void *EGLContext;
typedef void *EGLSurface;
typedef int32_t EGLint;
typedef unsigned int EGLBoolean;
typedef unsigned int EGLenum;

#define EGL_NO_DISPLAY ((EGLDisplay)0)
#define EGL_NO_CONTEXT ((EGLContext)0)
#define EGL_NO_SURFACE ((EGLSurface)0)
#define EGL_DEFAULT_DISPLAY ((void *)0)
#define EGL_PLATFORM_SURFACELESS_MESA 0x31DD
#define EGL_OPENGL_API 0x30A2
#define EGL_RENDERABLE_TYPE 0x3040
#define EGL_OPENGL_BIT 0x0008
#define EGL_SURFACE_TYPE 0x3033
#define EGL_PBUFFER_BIT 0x0001
#define EGL_NONE 0x3038
#define EGL_CONTEXT_MAJOR_VERSION 0x3098
#define EGL_CONTEXT_MINOR_VERSION 0x30FB
#define EGL_CONTEXT_OPENGL_PROFILE_MASK 0x30FD
#define EGL_CONTEXT_OPENGL_CORE_PROFILE_BIT 0x00000001

extern EGLDisplay eglGetDisplay(void *display_id);
extern EGLBoolean eglInitialize(EGLDisplay dpy, EGLint *major, EGLint *minor);
extern EGLBoolean eglBindAPI(EGLenum api);
extern EGLBoolean eglChooseConfig(EGLDisplay dpy, const EGLint *attribs,
                                  EGLConfig *configs, EGLint config_size,
                                  EGLint *num_config);
extern EGLContext eglCreateContext(EGLDisplay dpy, EGLConfig config,
                                   EGLContext share, const EGLint *attribs);
extern EGLBoolean eglMakeCurrent(EGLDisplay dpy, EGLSurface draw,
                                 EGLSurface read, EGLContext ctx);
extern EGLint eglGetError(void);
extern void (*eglGetProcAddress(const char *name))(void);
typedef void (*eglGetPlatformDisplayEXT_t)(void);
typedef EGLDisplay (*pfn_GetPlatformDisplayEXT)(EGLenum platform, void *dpy,
                                                const EGLint *attribs);

/* ---- minimal GL ABI (resolved via eglGetProcAddress) ---- */
typedef unsigned int GLenum;
typedef unsigned int GLuint;
typedef int GLint;
typedef int GLsizei;
typedef unsigned char GLubyte;
typedef unsigned char GLboolean;
typedef float GLfloat;
typedef char GLchar;
typedef ptrdiff_t GLsizeiptr;

#define GL_COLOR_BUFFER_BIT 0x00004000
#define GL_DEPTH_BUFFER_BIT 0x00000100
#define GL_DEPTH_TEST 0x0B71
#define GL_CULL_FACE 0x0B44
#define GL_TEXTURE_2D 0x0DE1
#define GL_TEXTURE0 0x84C0
#define GL_TEXTURE_MIN_FILTER 0x2801
#define GL_TEXTURE_MAG_FILTER 0x2800
#define GL_TEXTURE_WRAP_S 0x2802
#define GL_TEXTURE_WRAP_T 0x2803
#define GL_LINEAR 0x2601
#define GL_CLAMP_TO_EDGE 0x812F
#define GL_RGBA 0x1908
#define GL_RGBA8 0x8058
#define GL_UNSIGNED_BYTE 0x1401
#define GL_UNSIGNED_INT 0x1405
#define GL_FLOAT 0x1406
#define GL_TRIANGLES 0x0004
#define GL_ARRAY_BUFFER 0x8892
#define GL_ELEMENT_ARRAY_BUFFER 0x8893
#define GL_STATIC_DRAW 0x88E4
#define GL_FRAGMENT_SHADER 0x8B30
#define GL_VERTEX_SHADER 0x8B31
#define GL_COMPILE_STATUS 0x8B81
#define GL_LINK_STATUS 0x8B82
#define GL_FRAMEBUFFER 0x8D40
#define GL_RENDERBUFFER 0x8D41
#define GL_COLOR_ATTACHMENT0 0x8CE0
#define GL_DEPTH_ATTACHMENT 0x8D00
#define GL_FRAMEBUFFER_COMPLETE 0x8CD5
#define GL_DEPTH_COMPONENT24 0x81A6
#define GL_UNPACK_ALIGNMENT 0x0CF5
#define GL_PACK_ALIGNMENT 0x0D05

#define DECL(ret, name, args) static ret(*name) args;
DECL(void, glEnable, (GLenum))
DECL(void, glViewport, (GLint, GLint, GLsizei, GLsizei))
DECL(void, glClearColor, (GLfloat, GLfloat, GLfloat, GLfloat))
DECL(void, glClear, (GLenum))
DECL(void, glGenTextures, (GLsizei, GLuint *))
DECL(void, glBindTexture, (GLenum, GLuint))
DECL(void, glTexImage2D, (GLenum, GLint, GLint, GLsizei, GLsizei, GLint, GLenum, GLenum, const void *))
DECL(void, glTexParameteri, (GLenum, GLenum, GLint))
DECL(void, glActiveTexture, (GLenum))
DECL(void, glGenFramebuffers, (GLsizei, GLuint *))
DECL(void, glBindFramebuffer, (GLenum, GLuint))
DECL(void, glGenRenderbuffers, (GLsizei, GLuint *))
DECL(void, glBindRenderbuffer, (GLenum, GLuint))
DECL(void, glRenderbufferStorage, (GLenum, GLenum, GLsizei, GLsizei))
DECL(void, glFramebufferRenderbuffer, (GLenum, GLenum, GLenum, GLuint))
DECL(void, glFramebufferTexture2D, (GLenum, GLenum, GLenum, GLuint, GLint))
DECL(GLenum, glCheckFramebufferStatus, (GLenum))
DECL(GLuint, glCreateShader, (GLenum))
DECL(void, glShaderSource, (GLuint, GLsizei, const GLchar *const *, const GLint *))
DECL(void, glCompileShader, (GLuint))
DECL(void, glGetShaderiv, (GLuint, GLenum, GLint *))
DECL(void, glGetShaderInfoLog, (GLuint, GLsizei, GLsizei *, GLchar *))
DECL(GLuint, glCreateProgram, (void))
DECL(void, glAttachShader, (GLuint, GLuint))
DECL(void, glLinkProgram, (GLuint))
DECL(void, glGetProgramiv, (GLuint, GLenum, GLint *))
DECL(void, glGetProgramInfoLog, (GLuint, GLsizei, GLsizei *, GLchar *))
DECL(void, glUseProgram, (GLuint))
DECL(GLint, glGetUniformLocation, (GLuint, const GLchar *))
DECL(void, glUniformMatrix4fv, (GLint, GLsizei, GLboolean, const GLfloat *))
DECL(void, glUniform1i, (GLint, GLint))
DECL(GLint, glGetAttribLocation, (GLuint, const GLchar *))
DECL(void, glGenVertexArrays, (GLsizei, GLuint *))
DECL(void, glBindVertexArray, (GLuint))
DECL(void, glGenBuffers, (GLsizei, GLuint *))
DECL(void, glBindBuffer, (GLenum, GLuint))
DECL(void, glBufferData, (GLenum, GLsizeiptr, const void *, GLenum))
DECL(void, glVertexAttribPointer, (GLuint, GLint, GLenum, GLboolean, GLsizei, const void *))
DECL(void, glEnableVertexAttribArray, (GLuint))
DECL(void, glDrawElements, (GLenum, GLsizei, GLenum, const void *))
DECL(void, glReadPixels, (GLint, GLint, GLsizei, GLsizei, GLenum, GLenum, void *))
DECL(void, glFinish, (void))
DECL(void, glPixelStorei, (GLenum, GLint))
DECL(const GLubyte *, glGetString, (GLenum))
#undef DECL

#define RESOLVE(name)                                                     \
    do {                                                                  \
        *(void (**)(void)) & name = eglGetProcAddress(#name);             \
        if (!name) { fprintf(stderr, "missing GL symbol %s\n", #name);    \
                     exit(3); }                                           \
    } while (0)

static void resolve_gl(void) {
    RESOLVE(glEnable); RESOLVE(glViewport); RESOLVE(glClearColor);
    RESOLVE(glClear); RESOLVE(glGenTextures); RESOLVE(glBindTexture);
    RESOLVE(glTexImage2D); RESOLVE(glTexParameteri); RESOLVE(glActiveTexture);
    RESOLVE(glGenFramebuffers); RESOLVE(glBindFramebuffer);
    RESOLVE(glGenRenderbuffers); RESOLVE(glBindRenderbuffer);
    RESOLVE(glRenderbufferStorage); RESOLVE(glFramebufferRenderbuffer);
    RESOLVE(glFramebufferTexture2D); RESOLVE(glCheckFramebufferStatus);
    RESOLVE(glCreateShader); RESOLVE(glShaderSource); RESOLVE(glCompileShader);
    RESOLVE(glGetShaderiv); RESOLVE(glGetShaderInfoLog);
    RESOLVE(glCreateProgram); RESOLVE(glAttachShader); RESOLVE(glLinkProgram);
    RESOLVE(glGetProgramiv); RESOLVE(glGetProgramInfoLog); RESOLVE(glUseProgram);
    RESOLVE(glGetUniformLocation); RESOLVE(glUniformMatrix4fv);
    RESOLVE(glUniform1i); RESOLVE(glGetAttribLocation);
    RESOLVE(glGenVertexArrays); RESOLVE(glBindVertexArray);
    RESOLVE(glGenBuffers); RESOLVE(glBindBuffer); RESOLVE(glBufferData);
    RESOLVE(glVertexAttribPointer); RESOLVE(glEnableVertexAttribArray);
    RESOLVE(glDrawElements); RESOLVE(glReadPixels); RESOLVE(glFinish);
    RESOLVE(glPixelStorei); RESOLVE(glGetString);
}

/* Reference shaders (shader.vert:1-15 / shader.frag:1-9), core-profile form. */
static const char *VS =
    "#version 330 core\n"
    "uniform mat4 mvp;\n"
    "in vec3 position;\n"
    "in vec2 texcoord;\n"
    "out vec2 v_texcoord;\n"
    "void main() {\n"
    "  v_texcoord = texcoord;\n"
    "  gl_Position = mvp * vec4(position, 1.0);\n"
    "}\n";
static const char *FS =
    "#version 330 core\n"
    "uniform sampler2D colourSampler;\n"
    "in vec2 v_texcoord;\n"
    "out vec4 frag;\n"
    "void main() { frag = texture(colourSampler, v_texcoord); }\n";

static GLuint compile(GLenum type, const char *src) {
    GLuint s = glCreateShader(type);
    glShaderSource(s, 1, &src, NULL);
    glCompileShader(s);
    GLint ok = 0;
    glGetShaderiv(s, GL_COMPILE_STATUS, &ok);
    if (!ok) {
        char log[2048];
        glGetShaderInfoLog(s, sizeof log, NULL, log);
        fprintf(stderr, "shader compile failed:\n%s\n", log);
        exit(4);
    }
    return s;
}

static void read_exact(FILE *f, void *dst, size_t n) {
    if (fread(dst, 1, n, f) != n) {
        fprintf(stderr, "short read\n");
        exit(2);
    }
}

int main(int argc, char **argv) {
    if (argc < 3) {
        fprintf(stderr, "usage: %s scene.bin out.rgba\n", argv[0]);
        return 1;
    }
    FILE *f = fopen(argv[1], "rb");
    if (!f) { perror("scene"); return 2; }
    int32_t hdr[6];
    read_exact(f, hdr, sizeof hdr);
    int w = hdr[0], h = hdr[1], nv = hdr[2], ni = hdr[3];
    int tw = hdr[4], th = hdr[5];
    float mvp[16];
    read_exact(f, mvp, sizeof mvp);
    float *verts = malloc((size_t)nv * 3 * 4);
    float *uvs = malloc((size_t)nv * 2 * 4);
    uint32_t *idx = malloc((size_t)ni * 4);
    unsigned char *tex = malloc((size_t)tw * th * 4);
    read_exact(f, verts, (size_t)nv * 3 * 4);
    read_exact(f, uvs, (size_t)nv * 2 * 4);
    read_exact(f, idx, (size_t)ni * 4);
    read_exact(f, tex, (size_t)tw * th * 4);
    fclose(f);

    /* EGL surfaceless (Mesa llvmpipe; no display, no GPU device needed) */
    pfn_GetPlatformDisplayEXT getPlatformDisplay =
        (pfn_GetPlatformDisplayEXT)eglGetProcAddress("eglGetPlatformDisplayEXT");
    EGLDisplay dpy = EGL_NO_DISPLAY;
    if (getPlatformDisplay)
        dpy = getPlatformDisplay(EGL_PLATFORM_SURFACELESS_MESA, EGL_DEFAULT_DISPLAY, NULL);
    if (dpy == EGL_NO_DISPLAY)
        dpy = eglGetDisplay(EGL_DEFAULT_DISPLAY);
    EGLint maj, min;
    if (!eglInitialize(dpy, &maj, &min)) {
        fprintf(stderr, "eglInitialize failed: 0x%x\n", eglGetError());
        return 5;
    }
    eglBindAPI(EGL_OPENGL_API);
    /* Surfaceless Mesa may expose no matching configs at all; fall back to a
     * configless context (EGL_KHR_no_config_context) — we only render to an
     * FBO, so no surface format is ever needed. */
    EGLint cfg_attribs[] = {EGL_RENDERABLE_TYPE, EGL_OPENGL_BIT, EGL_NONE};
    EGLConfig cfg = (EGLConfig)0; /* EGL_NO_CONFIG_KHR */
    EGLint ncfg = 0;
    if (!eglChooseConfig(dpy, cfg_attribs, &cfg, 1, &ncfg) || ncfg < 1) {
        EGLint any[] = {EGL_NONE};
        if (!eglChooseConfig(dpy, any, &cfg, 1, &ncfg) || ncfg < 1) {
            fprintf(stderr, "no EGL config; using EGL_NO_CONFIG_KHR\n");
            cfg = (EGLConfig)0;
        }
    }
    EGLint ctx_attribs[] = {EGL_CONTEXT_MAJOR_VERSION, 3,
                            EGL_CONTEXT_MINOR_VERSION, 3,
                            EGL_CONTEXT_OPENGL_PROFILE_MASK,
                            EGL_CONTEXT_OPENGL_CORE_PROFILE_BIT, EGL_NONE};
    EGLContext ctx = eglCreateContext(dpy, cfg, EGL_NO_CONTEXT, ctx_attribs);
    if (!ctx) { fprintf(stderr, "eglCreateContext failed: 0x%x\n", eglGetError()); return 5; }
    if (!eglMakeCurrent(dpy, EGL_NO_SURFACE, EGL_NO_SURFACE, ctx)) {
        fprintf(stderr, "eglMakeCurrent (surfaceless) failed: 0x%x\n", eglGetError());
        return 5;
    }
    resolve_gl();
    fprintf(stderr, "GL renderer: %s | version: %s\n",
            glGetString(0x1F01), glGetString(0x1F02));

    /* FBO: RGBA8 colour + 24-bit depth at the requested output size */
    GLuint fbo, rb_c, rb_d;
    glGenFramebuffers(1, &fbo);
    glBindFramebuffer(GL_FRAMEBUFFER, fbo);
    glGenRenderbuffers(1, &rb_c);
    glBindRenderbuffer(GL_RENDERBUFFER, rb_c);
    glRenderbufferStorage(GL_RENDERBUFFER, GL_RGBA8, w, h);
    glFramebufferRenderbuffer(GL_FRAMEBUFFER, GL_COLOR_ATTACHMENT0, GL_RENDERBUFFER, rb_c);
    glGenRenderbuffers(1, &rb_d);
    glBindRenderbuffer(GL_RENDERBUFFER, rb_d);
    glRenderbufferStorage(GL_RENDERBUFFER, GL_DEPTH_COMPONENT24, w, h);
    glFramebufferRenderbuffer(GL_FRAMEBUFFER, GL_DEPTH_ATTACHMENT, GL_RENDERBUFFER, rb_d);
    if (glCheckFramebufferStatus(GL_FRAMEBUFFER) != GL_FRAMEBUFFER_COMPLETE) {
        fprintf(stderr, "FBO incomplete\n");
        return 6;
    }

    /* GL state exactly as MeshRenderer sets it (render.py:631-634) */
    glEnable(GL_CULL_FACE);
    glEnable(GL_DEPTH_TEST);
    glClearColor(0.f, 0.f, 0.f, 1.f);
    glViewport(0, 0, w, h);

    GLuint prog = glCreateProgram();
    glAttachShader(prog, compile(GL_VERTEX_SHADER, VS));
    glAttachShader(prog, compile(GL_FRAGMENT_SHADER, FS));
    glLinkProgram(prog);
    GLint ok = 0;
    glGetProgramiv(prog, GL_LINK_STATUS, &ok);
    if (!ok) { fprintf(stderr, "link failed\n"); return 4; }
    glUseProgram(prog);

    /* texture (render.py:348-366): RGBA8, LINEAR, clamp */
    GLuint texid;
    glGenTextures(1, &texid);
    glActiveTexture(GL_TEXTURE0);
    glBindTexture(GL_TEXTURE_2D, texid);
    glPixelStorei(GL_UNPACK_ALIGNMENT, 1);
    glTexImage2D(GL_TEXTURE_2D, 0, GL_RGBA8, tw, th, 0, GL_RGBA, GL_UNSIGNED_BYTE, tex);
    glTexParameteri(GL_TEXTURE_2D, GL_TEXTURE_MIN_FILTER, GL_LINEAR);
    glTexParameteri(GL_TEXTURE_2D, GL_TEXTURE_MAG_FILTER, GL_LINEAR);
    glTexParameteri(GL_TEXTURE_2D, GL_TEXTURE_WRAP_S, GL_CLAMP_TO_EDGE);
    glTexParameteri(GL_TEXTURE_2D, GL_TEXTURE_WRAP_T, GL_CLAMP_TO_EDGE);
    glUniform1i(glGetUniformLocation(prog, "colourSampler"), 0);

    /* mesh buffers (render.py:412-434) */
    GLuint vao, vbo_p, vbo_t, ebo;
    glGenVertexArrays(1, &vao);
    glBindVertexArray(vao);
    glGenBuffers(1, &vbo_p);
    glBindBuffer(GL_ARRAY_BUFFER, vbo_p);
    glBufferData(GL_ARRAY_BUFFER, (GLsizeiptr)nv * 3 * 4, verts, GL_STATIC_DRAW);
    GLint loc_p = glGetAttribLocation(prog, "position");
    glVertexAttribPointer((GLuint)loc_p, 3, GL_FLOAT, 0, 0, 0);
    glEnableVertexAttribArray((GLuint)loc_p);
    glGenBuffers(1, &vbo_t);
    glBindBuffer(GL_ARRAY_BUFFER, vbo_t);
    glBufferData(GL_ARRAY_BUFFER, (GLsizeiptr)nv * 2 * 4, uvs, GL_STATIC_DRAW);
    GLint loc_t = glGetAttribLocation(prog, "texcoord");
    glVertexAttribPointer((GLuint)loc_t, 2, GL_FLOAT, 0, 0, 0);
    glEnableVertexAttribArray((GLuint)loc_t);
    glGenBuffers(1, &ebo);
    glBindBuffer(GL_ELEMENT_ARRAY_BUFFER, ebo);
    glBufferData(GL_ELEMENT_ARRAY_BUFFER, (GLsizeiptr)ni * 4, idx, GL_STATIC_DRAW);

    /* draw (render.py:799-822): clear, upload mvp transposed, draw elements */
    glClear(GL_COLOR_BUFFER_BIT | GL_DEPTH_BUFFER_BIT);
    glUniformMatrix4fv(glGetUniformLocation(prog, "mvp"), 1, 1 /*transpose*/, mvp);
    glDrawElements(GL_TRIANGLES, ni, GL_UNSIGNED_INT, 0);
    glFinish();

    /* Optional throughput bench (round 5, roofline context): GL_BENCH_FRAMES=N
     * re-renders the frame N times (tiny per-frame mvp jitter so the driver
     * cannot skip work) and prints frames/s to stderr. This measures what the
     * reference's own software-GL path (llvmpipe, the only GL on this host)
     * achieves on the exact bench scene — the apples-to-apples software
     * rasteriser baseline for BASELINE.md's 500 fps north star. */
    const char *benv = getenv("GL_BENCH_FRAMES");
    if (benv && atoi(benv) > 0) {
        int bn = atoi(benv);
        float m2[16];
        struct timespec t0, t1;
        clock_gettime(CLOCK_MONOTONIC, &t0);
        for (int k = 0; k < bn; k++) {
            memcpy(m2, mvp, sizeof m2);
            m2[3] += 1e-6f * (float)(k % 7); /* jitter: defeat draw caching */
            glClear(GL_COLOR_BUFFER_BIT | GL_DEPTH_BUFFER_BIT);
            glUniformMatrix4fv(glGetUniformLocation(prog, "mvp"), 1, 1, m2);
            glDrawElements(GL_TRIANGLES, ni, GL_UNSIGNED_INT, 0);
        }
        glFinish();
        clock_gettime(CLOCK_MONOTONIC, &t1);
        double dt = (double)(t1.tv_sec - t0.tv_sec)
            + 1e-9 * (double)(t1.tv_nsec - t0.tv_nsec);
        fprintf(stderr, "GL_BENCH: %d frames in %.2fs = %.2f frames/s "
                "(%.2f ms/frame)\n", bn, dt, bn / dt, dt * 1e3 / bn);
    }

    unsigned char *out = malloc((size_t)w * h * 4);
    glPixelStorei(GL_PACK_ALIGNMENT, 1);
    glReadPixels(0, 0, w, h, GL_RGBA, GL_UNSIGNED_BYTE, out);

    FILE *o = fopen(argv[2], "wb");
    if (!o) { perror("out"); return 2; }
    fwrite(out, 1, (size_t)w * h * 4, o);
    fclose(o);
    fprintf(stderr, "wrote %dx%d RGBA\n", w, h);
    return 0;
}
