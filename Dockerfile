# Fish Diffusion TPU — runtime image (parity with the reference Dockerfile:
# python base + deps + auto vocoder conversion hook; CUDA bits replaced by
# the JAX TPU stack)
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make git openssh-server && \
    rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY fish_diffusion_tpu ./fish_diffusion_tpu
COPY configs ./configs
COPY tools ./tools
COPY dictionaries ./dictionaries

# TPU VM images ship libtpu; install the matching jax wheel for your pod:
#   pip install 'jax[tpu]' -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
RUN pip install --no-cache-dir -e .

# optional: convert a mounted NSF-HiFiGAN torch checkpoint at startup
ENV NSF_HIFIGAN_TORCH=/checkpoints/nsf_hifigan/model
CMD ["/bin/bash", "-c", "\
  if [ -f \"$NSF_HIFIGAN_TORCH\" ] && [ ! -f \"${NSF_HIFIGAN_TORCH%.pkl}.pkl\" ]; then \
    python tools/nsf_hifigan/convert_checkpoint.py --input \"$NSF_HIFIGAN_TORCH\" --output \"$NSF_HIFIGAN_TORCH.pkl\" || true; \
  fi; exec /bin/bash"]
