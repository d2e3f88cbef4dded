"""Pano360 acquisition from Flickr (reference
``scripts/download_flickr.py:49-237``): fetch the panorama set either by
an explicit photo-id list (``flickr_photo_ids.npy``) or by group/tag
scrape, saving the original-size image + EXIF JSON per photo.

Implemented against the plain Flickr REST API with ``requests`` (the
reference uses the ``flickrapi`` package, not present here). Requires
network access and a ``FLICKR_API_KEY`` env var; in offline environments
every call raises a clear error instead of hanging.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

REST = 'https://api.flickr.com/services/rest/'


class FlickrDownloader:
    def __init__(self, api_key: Optional[str] = None,
                 out_folder: str = 'data/pano360/raw',
                 require_exif: bool = False,
                 originals_only: bool = True):
        self.api_key = api_key or os.environ.get('FLICKR_API_KEY', '')
        if not self.api_key:
            raise RuntimeError(
                'FLICKR_API_KEY not set — Pano360 download needs a Flickr '
                'API key (see reference scripts/download_flickr.py)')
        self.out_folder = out_folder
        self.require_exif = require_exif
        self.originals_only = originals_only
        os.makedirs(out_folder, exist_ok=True)

    def _call(self, method: str, **params):
        import requests

        params.update(dict(
            method=method, api_key=self.api_key, format='json',
            nojsoncallback=1))
        r = requests.get(REST, params=params, timeout=30)
        r.raise_for_status()
        return r.json()

    def download_by_ids(self, photo_ids: List[str]):
        """Reference photo-id-list path (:220-233)."""
        for pid in photo_ids:
            try:
                self._download_photo(str(pid))
            except Exception as e:
                print(f'[flickr] {pid}: {e}')

    def download_group(self, group_id: str, per_page: int = 500,
                       max_pages: int = 20):
        """Group-scrape path (:185-217)."""
        for page in range(1, max_pages + 1):
            data = self._call('flickr.groups.pools.getPhotos',
                              group_id=group_id, per_page=per_page,
                              page=page)
            photos = data.get('photos', {}).get('photo', [])
            if not photos:
                break
            for p in photos:
                try:
                    self._download_photo(p['id'])
                except Exception as e:
                    print(f"[flickr] {p['id']}: {e}")

    def _download_photo(self, photo_id: str):
        import requests

        sizes = self._call('flickr.photos.getSizes',
                           photo_id=photo_id)['sizes']['size']
        best = sizes[-1]
        if self.originals_only and best['label'] != 'Original':
            return
        exif = None
        try:
            exif = self._call('flickr.photos.getExif',
                              photo_id=photo_id)['photo']
        except Exception:
            if self.require_exif:
                return
        url = best['source']
        ext = os.path.splitext(url)[1] or '.jpg'
        img_path = os.path.join(self.out_folder, f'{photo_id}{ext}')
        with open(img_path, 'wb') as f:
            r = requests.get(url, timeout=60)
            r.raise_for_status()  # a 404/HTML error page is not a photo
            f.write(r.content)
        if exif is not None:
            with open(os.path.join(self.out_folder,
                                   f'{photo_id}_exif.json'), 'w') as f:
                json.dump(exif, f)
