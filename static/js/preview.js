// Keep the original stream and the piano preview in lockstep and expose a
// crossfade between them (reference static/js/preview.js behavior).
(function () {
  const video = document.getElementById("video");
  const piano = document.getElementById("piano");
  const fader = document.getElementById("crossfade");
  const source =
    video && video.style.display !== "none"
      ? video
      : document.getElementById("original");
  if (!piano) return;

  function applyFade() {
    const x = fader ? fader.value / 100 : 0.5;
    if (source) source.volume = Math.cos((x * Math.PI) / 2);
    piano.volume = Math.sin((x * Math.PI) / 2);
  }
  if (fader) fader.addEventListener("input", applyFade);
  applyFade();

  if (!source || source === piano) return;
  const sync = () => {
    if (Math.abs(source.currentTime - piano.currentTime) > 0.1) {
      piano.currentTime = source.currentTime;
    }
  };
  source.addEventListener("play", () => {
    sync();
    piano.play();
  });
  source.addEventListener("pause", () => piano.pause());
  source.addEventListener("seeked", sync);
  piano.addEventListener("play", () => {
    if (source.paused) source.play();
  });
  piano.addEventListener("pause", () => {
    if (!source.paused) source.pause();
  });
})();
